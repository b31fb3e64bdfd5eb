"""Shared staging helpers for the pair-producing ext operators."""

from __future__ import annotations

from pyspark.sql import DataFrame

#: Runtime conf key: set to a cluster-visible directory (HDFS/S3) to
#: make every per-iteration lineage cut in the iterative operators a
#: RELIABLE checkpoint instead of a localCheckpoint. When set, this
#: module takes OWNERSHIP of the SparkContext's checkpoint directory
#: (see :func:`cut_lineage`).
CHECKPOINT_DIR_CONF = "spark.financial_tracker_etl_spark.checkpointDir"

#: Reliable checkpoints retained per context when the knob is active.
#: Mirrors Spark ML's ``PeriodicCheckpointer``: once a newer checkpoint
#: has materialized, iterations older than the last ``CHECKPOINT_KEEP``
#: are dead weight — without retention a 20-iteration pagerank on the
#: reliable path would leave ~10 full copies of the rank vector on DFS
#: per run, exactly the long-job/spot-fleet scenario the knob targets.
#: 2, not 1: the in-flight cut may still read the previous iteration's
#: checkpointed frame while materializing.
CHECKPOINT_KEEP = 2


def _resolved_checkpoint_parent(sc) -> str | None:
    """The PARENT of the context's resolved checkpoint dir, qualified.

    ``setCheckpointDir(target)`` stores ``<qualified target>/<uuid>``;
    comparing the parent against the qualified target tells us whether
    the context is currently pointed at our knob directory — without a
    shadow attribute that goes stale if foreign code calls
    ``setCheckpointDir`` in between (round-7 ADVICE low).
    """
    resolved = sc.getCheckpointDir()
    if not resolved:
        return None
    jvm = sc._jvm
    return str(jvm.org.apache.hadoop.fs.Path(resolved).getParent())


def _qualified(sc, target: str) -> str:
    jvm = sc._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(target)
    fs = hpath.getFileSystem(sc._jsc.hadoopConfiguration())
    return str(fs.makeQualified(hpath))


def _reap_old_checkpoints(sc) -> None:
    """Keep only the newest :data:`CHECKPOINT_KEEP` ``rdd-*`` entries
    under the context's resolved checkpoint dir.

    Reliable checkpoints are written as ``<dir>/<uuid>/rdd-<id>`` with
    monotonically increasing RDD ids, so newest-by-id == newest-by-time.
    Spark's own cleaner does not help here:
    ``spark.cleaner.referenceTracking.cleanCheckpoints`` is read once at
    ContextCleaner construction (session start) and only fires on
    driver-side GC, so checkpoints otherwise accumulate forever.
    """
    resolved = sc.getCheckpointDir()
    if not resolved:
        return
    jvm = sc._jvm
    dir_path = jvm.org.apache.hadoop.fs.Path(resolved)
    fs = dir_path.getFileSystem(sc._jsc.hadoopConfiguration())
    if not fs.exists(dir_path):
        return
    entries = []
    for status in fs.listStatus(dir_path):
        name = status.getPath().getName()
        if name.startswith("rdd-"):
            try:
                entries.append((int(name[4:]), status.getPath()))
            except ValueError:
                continue
    entries.sort()
    for _, path in entries[: max(0, len(entries) - CHECKPOINT_KEEP)]:
        fs.delete(path, True)


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

    Ownership + retention (knob set): this function takes ownership of
    the SparkContext's checkpoint directory — it re-points the context
    at the knob path whenever the currently-resolved directory differs
    (detected from the live context, so a foreign ``setCheckpointDir``
    in between is corrected, not silently adopted), and after each new
    checkpoint materializes it deletes all but the newest
    :data:`CHECKPOINT_KEEP` checkpoints under that directory
    (``PeriodicCheckpointer`` semantics). Callers that need more than
    the last two checkpointed frames to stay resurrectable, or that
    manage ``setCheckpointDir`` themselves, should leave the knob unset.
    """
    spark = df.sparkSession
    target = spark.conf.get(CHECKPOINT_DIR_CONF, None)
    if target:
        sc = spark.sparkContext
        if _resolved_checkpoint_parent(sc) != _qualified(sc, target):
            sc.setCheckpointDir(target)
        out = df.checkpoint(eager=True)
        _reap_old_checkpoints(sc)
        return out
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
