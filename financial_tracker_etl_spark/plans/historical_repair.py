"""Flagship pipeline: historical month-gap detection and repair
(SURVEY.md §3.2; reference:
etl/jobs/fetch_historical_market_data/fetch_historical_market_data.py:121-129
+ etl/fetch_utils.py:152-233).

End to end, all declarative DataFrame ops:

  requests --drop unknown types--> spine(symbol × month, end clamped)
        LEFT ANTI existing(symbol, month)      -> missing months
        --deterministic simulated fetch-->        backfill rows
        UNION existing                         -> repaired table

The "fetch" is a pure column expression standing in for the HTTP quote
source (reference: etl/utils.py:249-366): price is a deterministic
function of (symbol, month) so the oracle can reproduce it. A real
connector drops in by replacing :func:`simulate_fetch`.

Scale: the only shuffle is the monthly table's groupBy in the fixture;
the spine is payload-sized and broadcast; the date-range filter on
``existing`` pushes into the parquet scan (partition pruning on a
date-partitioned 100 TB table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .. import fixtures
from ..catalog import load_table
from ..operators.gaps import fetch_windows, missing_months, month_spine
from ..operators.validation import drop_unknown_asset_types

START = "1995-01-01"
END = "1996-12-01"


def simulate_fetch(missing: DataFrame) -> DataFrame:
    """Deterministic stand-in for the historical quote API (S5).

    price = numeric(symbol)*10000 + year*100 + month, computed in
    integer arithmetic and cast to double at the end — bit-identical in
    Spark and DuckDB (no floating-point accumulation anywhere).
    """
    return missing.select(
        "symbol",
        "asset_type",
        F.col("month").alias("date"),
        (
            F.expr("CAST(substring(symbol, 4) AS BIGINT)") * 10000
            + F.year("month") * 100
            + F.month("month")
        )
        .cast("double")
        .alias("price"),
    )


def _inputs(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    part = load_table(spark, sf_dir, "part")
    lineitem = load_table(spark, sf_dir, "lineitem")
    requests = drop_unknown_asset_types(
        fixtures.assets_request(part), fixtures.KNOWN_ASSET_TYPES
    )
    existing = fixtures.market_data_monthly(lineitem).filter(
        (F.col("date") >= F.lit(START)) & (F.col("date") <= F.lit(END))
    )
    return requests, existing


def missing_months_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 output: every (symbol, asset_type, month) gap in START..END."""
    requests, existing = _inputs(spark, sf_dir)
    spine = month_spine(requests, F.lit(START), F.lit(END), F.lit(END))
    return missing_months(spine, existing)


def fetch_windows_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 output: per-symbol (min, max, count) of missing months."""
    return fetch_windows(missing_months_df(spark, sf_dir))


def repaired_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship result: existing rows plus backfilled rows, flagged.

    Missing keys are disjoint from existing keys by construction, so the
    keyed upsert reduces to a union — the overlapping-key merge path is
    exercised separately by the ``upsert_market_data`` query.
    """
    requests, existing = _inputs(spark, sf_dir)
    spine = month_spine(requests, F.lit(START), F.lit(END), F.lit(END))
    missing = missing_months(spine, existing)
    fetched = simulate_fetch(missing).withColumn("backfilled", F.lit(True))
    current = existing.select(
        "symbol", "asset_type", "date", "price", F.lit(False).alias("backfilled")
    )
    return current.unionByName(
        fetched.select("symbol", "asset_type", "date", "price", "backfilled")
    )


def repair_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST5/A3-style completion metadata: per asset_type, rows served
    from state vs backfilled (reference completion payloads:
    etl/jobs/fetch_historical_market_data/fetch_historical_market_data.py:132-153;
    wall-clock fields excluded — SURVEY.md §7 watch-out (e))."""
    return (
        repaired_table(spark, sf_dir)
        .groupBy("asset_type")
        .agg(
            F.count(F.lit(1)).alias("total_rows"),
            F.sum(F.when(F.col("backfilled"), 1).otherwise(0)).alias(
                "backfilled_rows"
            ),
            F.countDistinct("symbol").alias("symbols"),
        )
    )
