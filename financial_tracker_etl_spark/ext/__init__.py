"""Shared staging helpers for the pair-producing ext operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def materialize_release(out: DataFrame, *staged: DataFrame) -> DataFrame:
    """Materialize ``out`` into cache with one cheap ``count`` action,
    then release the staging caches it consumed.

    This is the fan-out operators' end-of-build step: the O(pairs)
    output is small next to the staged intermediate (shingles /
    fingerprints / bucketed vectors), so we pin the output and drop the
    intermediate before returning. ``persist`` + ``count`` rather than
    ``localCheckpoint(eager=True)`` deliberately:

    - lineage is KEPT, so on a real cluster an executor loss recomputes
      the lost partitions instead of failing the job (checkpoint blocks
      live in non-replicated executor block storage);
    - cache blocks are LRU-evictable and freed by the ContextCleaner
      when the frame is garbage collected, so repeated operator calls
      do not accumulate unreclaimable checkpoint blocks.

    Caller-side contract: the returned frame is persisted and is NOT
    unpersisted by this module. A caller that retains references to
    many operator outputs in a long-lived driver should
    ``out.unpersist()`` each one when done with it (GC/ContextCleaner
    only reclaims blocks whose frames are unreachable); batch loops
    that run many operators back-to-back may instead call
    ``spark.catalog.clearCache()`` between iterations, as
    ``ladder.main`` and ``bench.py`` do.
    """
    out = out.persist()
    out.count()
    for df in staged:
        df.unpersist(blocking=False)
    return out
