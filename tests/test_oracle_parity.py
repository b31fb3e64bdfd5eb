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


def test_registry_and_driver_contract_shape():
    """Meta-contract: every registry query carries an oracle (the
    driver's strongest check), queries()/oracle_sql() keys agree
    exactly, the gate prefix is exactly 50 and duplicate-free, and the
    bench set stays the stable 14-query headline suite."""
    import __spark_entry__ as entry
    from financial_tracker_etl_spark.queries import registry, _CHECK_FIRST

    reg = registry()
    assert len(reg) >= 104
    assert all(spec.oracle and "SELECT" in spec.oracle.upper() for spec in reg.values())
    q = entry.queries()
    o = entry.oracle_sql()
    assert list(q) == list(reg)
    assert set(o) == set(q)
    assert len(_CHECK_FIRST) == 50 == len(set(_CHECK_FIRST))
    assert list(reg)[:50] == _CHECK_FIRST
    bench = [n for n, s in reg.items() if s.bench]
    assert len(bench) == 14, bench
