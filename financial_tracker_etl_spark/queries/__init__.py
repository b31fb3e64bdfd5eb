"""Query registry: every implemented operator exposed as a named query.

Each :class:`QuerySpec` pairs a Spark callable ``(spark, sf_dir) ->
DataFrame`` with the equivalent DuckDB oracle SQL (None for genuinely
non-SQL-expressible ops, which the driver checks rows-only). The driver
contract (``__spark_entry__.py``) is a thin view over this registry.

Column-name parity between the two sides is load-bearing: the driver
sorts columns by name before hashing values.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    bench: bool = False  # include in bench.py headline set


def registry() -> dict[str, QuerySpec]:
    from . import analytics, core, ext, stream

    out: dict[str, QuerySpec] = {}
    for mod in (core, analytics, ext, stream):
        dup = set(out) & set(mod.QUERIES)
        if dup:
            raise ValueError(f"duplicate query names: {dup}")
        out.update(mod.QUERIES)
    return out
