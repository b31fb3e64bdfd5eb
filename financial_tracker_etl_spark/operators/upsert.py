"""Keyed upsert materialization (SURVEY.md §2.A S9–S11).

The reference upserts row-at-a-time with
``INSERT … ON CONFLICT (key) DO UPDATE``
(reference: etl/jobs/fetch_market_data/fetch_market_data.py:31-61,
etl/jobs/fetch_market_index_data/fetch_market_index_data.py:71-107,
etl/jobs/fetch_historical_market_data/fetch_historical_market_data.py:88-109).
Its loop order makes "last write" well-defined; a distributed engine
must make the tie-break EXPLICIT (SURVEY.md §7 watch-out (a)):

    row_number() OVER (PARTITION BY key ORDER BY version DESC, ...) = 1

Scale notes: one shuffle on the upsert key, which is the minimum
possible; at 100 TB the target table would be bucketed/partitioned by
the same key so the merge co-locates. The same function body is the
``foreachBatch`` merge for streaming (idempotent — reprocessing a batch
yields identical state, giving effective exactly-once on keys, ST2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def upsert_last_write_wins(
    current: DataFrame,
    updates: DataFrame,
    keys: list[str],
    order_by: list[Column],
) -> DataFrame:
    """Merge ``updates`` into ``current`` keeping, per key, the row that
    sorts FIRST under ``order_by`` (pass descending versions for
    last-write-wins). ``order_by`` must be a total order within a key —
    updates win ties via the ``_src`` column appended here, so a
    deterministic result never depends on partition order.
    """
    cur = current.withColumn("_src", F.lit(0))
    upd = updates.withColumn("_src", F.lit(1))
    w = Window.partitionBy(*keys).orderBy(*order_by, F.col("_src").desc())
    return (
        cur.unionByName(upd)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )
