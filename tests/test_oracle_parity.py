"""Differential tests mirroring the driver's correctness gate:
every registry query vs its DuckDB oracle at sf0.001."""

from __future__ import annotations

import pytest

from financial_tracker_etl_spark.queries import registry
from financial_tracker_etl_spark.verify import run_one

from conftest import SF_DIR

NAMES = sorted(registry())


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, duck, name):
    ok, msg = run_one(spark, duck, SF_DIR, name)
    assert ok, f"{name}: {msg}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert len(df.columns) > 0


def test_contract_shape():
    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 14
