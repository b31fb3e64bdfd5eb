"""Calendar-spine gap detection — the reference's distinctive logic
(SURVEY.md §2.C J3, §2.D A2; reference: etl/fetch_utils.py:152-233).

The reference builds ``{symbol: set(dates)}`` from the DB, generates the
expected month list start..end per symbol, set-subtracts, and fetches
the ``(min(missing), max(missing))`` window. Relationally:

    spine(symbol × month)  LEFT ANTI  existing(symbol, month)
      → groupBy(symbol).agg(min(month), max(month))

Scale notes: the spine is requests × months — small (payload-sized), so
it stays broadcast-able; ``existing`` is the 100 TB side and is only
touched by one semi-filtered scan (predicate on the date range pushes
into parquet). The anti-join puts the big table on the build side only
if AQE decides it fits; with a broadcast-sized spine Spark streams the
big side exactly once.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.datetime_fns import clamp_end_date, month_floor, month_sequence


def month_spine(
    requests: DataFrame,
    start: Column,
    end: Column,
    clamp_today: Column | None = None,
) -> DataFrame:
    """Expected (symbol, asset_type, month) grid for start..end,
    end clamped so future months are never expected
    (reference: etl/fetch_utils.py:182-218)."""
    end = clamp_end_date(
        month_floor(end),
        clamp_today.cast("date") if clamp_today is not None else None,
    )
    return requests.select(
        "symbol",
        "asset_type",
        F.explode(month_sequence(start, end)).alias("month"),
    )


def missing_months(spine: DataFrame, existing: DataFrame) -> DataFrame:
    """J3: expected minus existing per (symbol, asset_type, month)
    (reference: etl/fetch_utils.py:203-233 ``expected - existing``).

    ``asset_type`` participates in the anti-join whenever the existing
    side carries it: coverage stored under one asset_type must not
    mask a gap under another (the fixtures are 1:1 symbol→asset_type,
    but the operator contract cannot depend on that), matching
    :func:`fetch_windows`, which groups by (symbol, asset_type)."""
    keys = ["symbol", "month"]
    cols: list = ["symbol", F.col("date").alias("month")]
    if "asset_type" in existing.columns and "asset_type" in spine.columns:
        keys = ["symbol", "asset_type", "month"]
        cols = ["symbol", "asset_type", F.col("date").alias("month")]
    have = existing.select(*cols).distinct()
    return spine.join(have, on=keys, how="left_anti")


def fetch_windows(missing: DataFrame) -> DataFrame:
    """A2: per-symbol fetch window = (min(missing), max(missing))
    (reference: etl/fetch_utils.py:231). One API range call per symbol
    instead of one per month — the reference's own bandwidth
    optimization, preserved."""
    return missing.groupBy("symbol", "asset_type").agg(
        F.min("month").alias("window_start"),
        F.max("month").alias("window_end"),
        F.count(F.lit(1)).alias("missing_months"),
    )
