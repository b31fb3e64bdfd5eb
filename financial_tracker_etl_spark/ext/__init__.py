"""Shared staging helpers for the pair-producing ext operators."""

from __future__ import annotations

from pyspark.sql import DataFrame

#: Runtime conf key: set to a cluster-visible directory (HDFS/S3) to
#: make every per-iteration lineage cut in the iterative operators a
#: RELIABLE checkpoint instead of a localCheckpoint.
CHECKPOINT_DIR_CONF = "spark.financial_tracker_etl_spark.checkpointDir"


def cut_lineage(df: DataFrame) -> DataFrame:
    """Per-iteration lineage cut for the iterative operators (pagerank,
    BFS, connected components, k-means, BPE): materialize ``df`` and
    truncate its plan so the logical tree stays bounded across
    iterations.

    Default (knob unset): ``localCheckpoint(eager=True)``. The blocks
    live in NON-replicated executor block storage, so on a real cluster
    an executor loss mid-run fails the job and the retry starts over —
    acceptable for short iterative jobs (these run minutes, and a job
    retry is cheaper than paying a distributed write per iteration).

    Knob: set :data:`CHECKPOINT_DIR_CONF` on the session's runtime conf
    to a cluster-visible path to switch every cut to a RELIABLE
    ``checkpoint(eager=True)`` under that directory — iterations
    survive executor loss at the cost of one DFS write+read of the
    evolving vector per cut. The right trade for long jobs on
    preemptible/spot fleets, where the expected number of losses over
    the run exceeds one.
    """
    spark = df.sparkSession
    target = spark.conf.get(CHECKPOINT_DIR_CONF, None)
    if target:
        sc = spark.sparkContext
        # setCheckpointDir appends a per-context UUID subdir; remember
        # what we last configured instead of re-deriving it from the
        # resolved path.
        if getattr(sc, "_ftes_checkpoint_dir", None) != target:
            sc.setCheckpointDir(target)
            sc._ftes_checkpoint_dir = target
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)


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
