"""Window-function operators (SURVEY.md §2.D A4, §2.E, §2.F O2).

Covers the reference's implicit window semantics (last-per-group,
reference: etl/jobs/fetch_historical_market_data/fetch_historical_market_data.py:50-61
``api_data[-1]``) and the README-promised analytics surface that has no
code behind it in the reference (rolling SMA-20/50, pct_change —
reference: README.md:339-346) — exactly Spark window frames.

All of these shuffle once on the partition key and then stay within a
single stage; at 100 TB the monthly table is pre-partitioned by symbol
so the sort is local.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def last_per_group(
    df: DataFrame, keys: list[str], order_by: list[Column]
) -> DataFrame:
    """A4/O2: keep the first row per key under ``order_by`` (pass
    descending date for "latest"). ``order_by`` must totally order rows
    within a key for determinism."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def with_price_analytics(
    df: DataFrame,
    key: str = "symbol",
    order_col: str = "date",
    price_col: str = "price",
) -> DataFrame:
    """[DOC] indicators (reference README.md:339-346): previous price
    (lag), month-over-month change/pct_change, SMA-20/SMA-50 rolling
    means, and cumulative min/max. Pure window frames — no UDFs.

    The rolling means are computed as an exact DECIMAL window SUM
    divided by the window COUNT — `avg` over raw doubles accumulates
    in frame order, which differs between engines (fixtures.py
    determinism rules). The sum is scaled ×10⁴ PER ROW (a (36,8)
    product under Spark's precision-38 cap), floored into an exact
    BIGINT, and the double rebuilt with the same correctly-rounded op
    sequence on both engines — the direct wide-decimal→double cast
    double-rounds in DuckDB once the int128 numerator passes 2^53,
    which planted 1.5e12 prices reach inside one 20-row window
    (round-16 fuzzer, extreme-numeric class; the old per-row
    DECIMAL(18,8) cast simply threw under ANSI). On 2-decimal pristine
    prices the 4-decimal floor is the identity, so this is
    output-identical there."""
    w = Window.partitionBy(key).orderBy(order_col)
    price = F.col(price_col)
    prev = F.lag(price, 1).over(w)

    def _sma(n: int) -> Column:
        from ..fixtures import money_dec

        frame = w.rowsBetween(-(n - 1), 0)
        # narrow the window sum to (28,8) then scale ONCE — exact in
        # range and the measured fast path (see analytics._dsum)
        scaled = F.floor(
            F.sum(money_dec(price)).over(frame).cast("decimal(28,8)")
            * F.lit(10000)
        ).cast("long")
        exact = scaled.cast("double") / F.lit(10000.0)
        return exact / F.count(price).over(frame)

    return (
        df.withColumn("prev_price", prev)
        .withColumn("price_change", price - prev)
        .withColumn(
            "pct_change",
            F.when(prev.isNotNull() & (prev != 0), (price - prev) / prev * 100.0),
        )
        .withColumn("sma_20", _sma(20))
        .withColumn("sma_50", _sma(50))
        .withColumn("running_max", F.max(price).over(w))
        .withColumn("running_min", F.min(price).over(w))
    )
