"""Differential guards for the int64-overflow widenings (round 4).

The round-3 advisor's point was that an un-widened ppm product fails
SILENTLY at scale: with ANSI off Spark wraps while DuckDB errors (or
auto-promotes), so the differential gate would diverge instead of
flagging the bug — and the sf-scale testdata never reaches the
magnitudes that trigger it. These tests plant synthetic inputs whose
intermediates clear int64 by orders of magnitude (the un-widened code
provably wrapped on them) and assert the Spark query still equals its
DuckDB oracle — i.e. the widening is correct, not merely present.

Tables are injected by monkeypatching the query module's
``load_table`` (the established pattern from
test_int8_quantize_known_vectors); DuckDB sees the same rows via
registered pandas frames standing in for the parquet views.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from financial_tracker_etl_spark.verify import compare


def _run_differential(spark, module, tables: dict[str, pd.DataFrame], fn, oracle):
    """Run a registry query fn against injected tables on BOTH engines
    and compare with the driver-gate comparator."""
    sdf_tables = {
        name: spark.createDataFrame(pdf) for name, pdf in tables.items()
    }
    orig = module.load_table
    module.load_table = lambda _s, _d, name: sdf_tables[name]
    try:
        got = fn(spark, "injected").toPandas()
    finally:
        module.load_table = orig
    con = duckdb.connect()
    for name, pdf in tables.items():
        con.register(name, pdf)
    want = con.execute(oracle).fetchdf()
    ok, msg = compare(got, want)
    assert ok, msg
    return got


def test_gini_exact_at_int64_breaking_magnitudes(spark):
    """Σ rank·n_chars here is ~2e21 (int64 tops out at 9.2e18): the
    pre-widening `2 * _s1 * 1000000` wrapped several times over. The
    widened DECIMAL(38,0)/HUGEINT lanes must agree bit-for-bit."""
    from financial_tracker_etl_spark.queries import ext as ext_mod
    from financial_tracker_etl_spark.queries.ext import (
        _SOURCE_GINI_ORACLE,
        _q_source_length_gini,
    )

    n = 2000
    docs = pd.DataFrame(
        {
            "source": ["giant"] * n,
            "doc_id": [f"d{i:05d}" for i in range(n)],
            # ~1e15 chars per doc -> s1 ~ Σ rk·x ~ 2e21
            "n_chars": [10**15 + 7 * i for i in range(n)],
        }
    )
    got = _run_differential(
        spark, ext_mod, {"documents": docs}, _q_source_length_gini,
        _SOURCE_GINI_ORACLE,
    )
    # near-uniform lengths -> Gini near 0 (sanity that the value is
    # meaningful, not merely equal garbage on both engines)
    assert 0 <= got["gini_ppm"].iloc[0] < 10_000


def test_brand_regression_exact_when_cross_products_clear_int64(spark):
    """x·y ≈ 5e15 per row × 4000 rows -> Sxy ≈ 2e19 > int64: the
    pre-round-4 `F.sum(...).cast(decimal)` wrapped INSIDE the sum
    before the cast could widen. The fit must still match DuckDB's
    auto-promoted HUGEINT arithmetic exactly."""
    from financial_tracker_etl_spark.queries import analytics as am
    from financial_tracker_etl_spark.queries.analytics import (
        _BRAND_REGRESSION_ORACLE,
        _q_brand_regression,
    )

    # y = 1e12 cents per quantity unit: per-row x*y reaches 2.5e15, so
    # Sxy over 4000 rows is ~1e19 (the un-widened sum wrapped), while
    # the OUTPUTS stay in-domain: slope_ppm ~1e18 < int64, intercept ~0
    # (the fit is exact by construction).
    n = 4000
    xs = [1 + i % 50 for i in range(n)]
    lineitem = pd.DataFrame(
        {
            "l_partkey": [i % 10 for i in range(n)],
            "l_quantity": [float(x) for x in xs],
            # price units so that cents y = 1e12 * x exactly
            "l_extendedprice": [float(10**10 * x) for x in xs],
        }
    )
    part = pd.DataFrame(
        {"p_partkey": list(range(10)), "p_brand": [f"B{i%3}" for i in range(10)]}
    )
    got = _run_differential(
        spark, am, {"lineitem": lineitem, "part": part},
        _q_brand_regression, _BRAND_REGRESSION_ORACLE,
    )
    # exact linear relation: slope_ppm = 1e12 cents/unit * 1e6 ppm
    assert (got["slope_ppm"] == 10**18).all()
    assert (got["intercept_ppm"] == 0).all()


def test_winsorized_mean_exact_when_sum_times_ppm_clears_int64(spark):
    """Clamped-sum ≈ 1e18, ×1e6 ≈ 1e24: only the widened product
    survives. Both engines must produce the identical ppm mean."""
    from financial_tracker_etl_spark.queries import analytics as am
    from financial_tracker_etl_spark.queries.analytics import (
        _WINSORIZED_ORACLE,
        _q_winsorized_stats,
    )

    # x ~1e12: the clamped SUM is ~1e15 and sum*1e6 ~1e21 (the
    # un-widened product wrapped), while the OUTPUT mean_ppm ~1e18
    # stays inside int64 — the realistic 100 TB failure is exactly
    # this shape (huge accumulator, in-domain result).
    n = 1000
    lineitem = pd.DataFrame(
        {
            "l_returnflag": ["A"] * n,
            "l_quantity": [float(10**12 + i) for i in range(n)],
            "l_orderkey": list(range(n)),
            "l_linenumber": [1] * n,
        }
    )
    got = _run_differential(
        spark, am, {"lineitem": lineitem},
        _q_winsorized_stats, _WINSORIZED_ORACLE,
    )
    mean_ppm = got["winsorized_mean_ppm"].iloc[0]
    # ppm mean of values ~1e12 -> ~1e18; int64 could not have carried
    # the intermediate product that produced it
    assert 10**17 < mean_ppm < 9 * 10**18


def test_brand_share_total_exact_past_decimal18_per_value_cap(spark):
    """The grand total of brand_revenue_share sums ALREADY-AGGREGATED
    brand revenues; before round 5 it reused _dsum, whose per-VALUE
    DECIMAL(18,8) cast caps at 1e10 — a single brand clears that
    around TPC-H sf 1, where the ANSI cast threw (caught by the 8x
    replicated-input ladder). Plant brand revenues of ~1e12 and assert
    the widened DECIMAL(38,8) total still matches DuckDB exactly."""
    from financial_tracker_etl_spark.queries import analytics as am
    from financial_tracker_etl_spark.queries.analytics import (
        _BRAND_SHARE_ORACLE,
        _q_brand_share,
    )

    n = 2000
    lineitem = pd.DataFrame(
        {
            "l_partkey": [i % 10 for i in range(n)],
            # ~5e9 per row, ~1e12 per brand, ~3e12 grand total
            "l_extendedprice": [5.0e9 + (i % 7) for i in range(n)],
            "l_discount": [0.0] * n,
        }
    )
    part = pd.DataFrame(
        {"p_partkey": list(range(10)), "p_brand": [f"B{i%3}" for i in range(10)]}
    )
    got = _run_differential(
        spark, am, {"lineitem": lineitem, "part": part},
        _q_brand_share, _BRAND_SHARE_ORACLE,
    )
    assert got["brand_revenue"].sum() > 1e12  # past the old cap
    assert abs(got["revenue_share_pct"].sum() - 100.0) < 1e-6


def test_pricing_sums_exact_with_planted_extreme_prices(spark):
    """Round-16 extreme-numeric class, two mechanisms in one pin:
    (a) above ~2^26 DuckDB's multiply-based double→DECIMAL cast
    diverges from Spark's exact-binary-expansion cast
    (9999999999.99 → ….98999936 vs ….98999977), so fixtures.money_dec
    branches both engines onto the shortest-repr string route there;
    (b) a post-sum ×10⁴ hits Spark's precision-38 cap and rounds at
    scale 6, so _dsum scales PER ROW. Plant the full palette —
    including a 1.5e12 that overflowed the old DECIMAL(18,8) outright
    — and assert TPC-H Q1 stays bit-identical."""
    from financial_tracker_etl_spark.queries import analytics as am
    from financial_tracker_etl_spark.queries import registry

    li = pd.DataFrame(
        {
            "l_returnflag": ["A"] * 6,
            "l_linestatus": ["F"] * 6,
            "l_quantity": [1.0, 2.0, -123456.789, 9999999999.99, 1.5e12, 1e-9],
            "l_extendedprice": [9999999999.99, 1.5e12, -123456.789, 1e-9, 0.0, -1.0],
            "l_discount": [0.0, 1.0, 2.5, -0.5, 0.05, 0.0],
            "l_tax": [0.0, 2.5, -0.5, 0.08, 0.0, 1.0],
            "l_shipdate": pd.to_datetime(["1995-01-01"] * 6),
        }
    )
    spec = registry()["pricing_summary"]
    got = _run_differential(spark, am, {"lineitem": li}, spec.fn, spec.oracle)
    assert got["sum_base_price"].abs().max() > 1e12  # extremes really flowed


def test_percent_change_null_base_and_beyond_round_band(spark):
    """Round-16 extreme-numeric class on the shared market_data
    fixture: a 0.0 low made (high−low)/low THROW under ANSI (now a
    NULL percent via NULLIF on both engines), and a 1e-9 low drives
    the percent past 1e9, where DuckDB's multiply-based round(x, 6)
    perturbs the double (…898 → …900) while Spark's BigDecimal round
    is the identity — both engines now emit the RAW double above the
    shared guard (fixtures._pct_round / _pct_round_sql)."""
    from financial_tracker_etl_spark.queries import analytics as am
    from financial_tracker_etl_spark.queries import registry

    li = pd.DataFrame(
        {
            # partkeys % 3 != 0 so market_data keeps them
            "l_partkey": [1, 1, 2, 2, 5, 5],
            "l_extendedprice": [100.0, 0.0, 94958.53, 1e-9, 10.0, 5.0],
            "l_discount": [0.0] * 6,
            "l_shipdate": pd.to_datetime(["1995-01-01"] * 6),
        }
    )
    spec = registry()["unpivot_market_measures"]
    got = _run_differential(spark, am, {"lineitem": li}, spec.fn, spec.oracle)
    pct = got[got["measure"] == "percent_change"].set_index("symbol")["value"]
    assert pd.isna(pct["SYM1"])  # zero base → NULL, not a crash
    assert pct["SYM2"] > 1e9  # huge percent survived un-rounded
