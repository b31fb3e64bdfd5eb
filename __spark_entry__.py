"""Driver contract for the spark-graft builder (PySpark target).

Thin view over ``financial_tracker_etl_spark.queries.registry()``:
- ``entry(spark)`` runs the flagship historical-gap-repair pipeline at
  sf0.1 — bench scale, so the flagship's headline claim demonstrates
  itself (SURVEY.md §3.2),
- ``queries()`` exposes one callable per implemented SURVEY.md §2
  operator,
- ``oracle_sql()`` gives each one's DuckDB twin (omitted only for
  genuinely non-SQL-expressible ops).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from financial_tracker_etl_spark.queries import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.1 (bench scale); driver
    checks rows>0 and a stable schema."""
    from financial_tracker_etl_spark.plans.historical_repair import repaired_table

    return repaired_table(spark, "/root/testdata/sf0.1")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in registry().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in registry().items()
        if spec.oracle is not None
    }
