"""Runtime plan profiler: execute a query and report per-operator
SQLMetrics (rows, bytes, spill, scan/agg time) from the FINAL adaptive
physical plan.

``.explain`` shows the shape you asked for; this shows what actually
ran — numOutputRows per operator, shuffle bytes, spill — which is the
evidence that a plan is scale-safe (e.g. a broadcast side that stayed
KB-sized, a filter that actually pruned). The driver-side cost is one
pass over the plan tree; execution happens via the query's own
``toRdd().count()`` so no result rows ever reach the driver.

Usage:  python -m financial_tracker_etl_spark profile <query> [sf_dir]
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class NodeMetrics:
    depth: int
    name: str
    metrics: dict[str, int]
    # True for every node reached by descending through a
    # ReusedExchange/ReusedSubquery wrapper: the wrapper points back at
    # the ORIGINAL subtree (same plan objects, same metric
    # accumulators), so summing over the flat list without skipping
    # these counts each reused exchange/scan twice (round-13 ADVICE
    # low). Display keeps the full tree; audit sums must filter.
    reused: bool = False


_DESCEND_METHODS = ("executedPlan", "plan", "child")


def _subplans(node):
    """Children of a physical node, descending through AQE wrappers
    (AdaptiveSparkPlan.executedPlan, QueryStage.plan, ReusedExchange/
    WholeStageCodegen.child) that hide their subtree from children()."""
    kids = [node.children().apply(i) for i in range(node.children().size())]
    if kids:
        return kids
    for meth in _DESCEND_METHODS:
        try:
            sub = getattr(node, meth)()
        except Exception:
            continue
        if sub is not None and hasattr(sub, "nodeName"):
            return [sub]
    return []


def _node_metrics(node) -> dict[str, int]:
    out: dict[str, int] = {}
    it = node.metrics().iterator()
    while it.hasNext():
        kv = it.next()
        out[kv._1()] = int(kv._2().value())
    return out


def collect_metrics(df: DataFrame, execute: bool = True) -> list[NodeMetrics]:
    """Execute ``df``'s own queryExecution (unless already run) and
    return the final plan's per-node metrics, pre-order."""
    qe = df._jdf.queryExecution()
    if execute:
        qe.toRdd().count()  # runs THIS queryExecution; nothing collected
    rows: list[NodeMetrics] = []

    def walk(node, depth: int, reused: bool) -> None:
        name = node.nodeName()
        # The ReusedExchange wrapper row itself is flagged, not just its
        # descendants: ReusedExchangeExec exposes no SQLMetrics today,
        # but if a future Spark surfaced the original's aliased
        # accumulators on the wrapper, an unflagged wrapper row would
        # double-count in plan_io_summary (round-14 ADVICE low).
        into_reuse = reused or name.startswith("Reused")
        rows.append(NodeMetrics(depth, name, _node_metrics(node), into_reuse))
        for kid in _subplans(node):
            walk(kid, depth + 1, into_reuse)

    walk(qe.executedPlan(), 0, False)
    return rows


def plan_io_summary(rows: list[NodeMetrics]) -> dict:
    """Exchange/scan/spill accounting over a ``collect_metrics`` result
    with each physical node counted ONCE (``reused`` subtrees skipped —
    they alias the original subtree's accumulators).

    Scope caveat (round-13 ADVICE low): ``spill_bytes`` sums the
    per-node ``spillSize`` SQLMetric, which covers operator spill
    (sorts/aggs/joins) only — shuffle-WRITE spill never appears in node
    SQLMetrics. Use :func:`stage_delta_metrics` (task-level
    memory/diskBytesSpilled via the UI REST API) for the inclusive
    number.
    """
    shuffle_bytes: list[int] = []
    spill = 0
    scan = 0
    for r in rows:
        if r.reused:
            continue
        m = r.metrics
        if "shuffleBytesWritten" in m:
            shuffle_bytes.append(m["shuffleBytesWritten"])
        spill += m.get("spillSize", 0)
        # only leaf scan nodes carry filesSize; exchanges' dataSize is
        # deliberately not conflated into the scan denominator
        if r.name.startswith("Scan") and "filesSize" in m:
            scan += m["filesSize"]
    return {
        "shuffle_total_bytes": sum(shuffle_bytes),
        "shuffle_max_exchange_bytes": max(shuffle_bytes, default=0),
        "n_exchanges": len(shuffle_bytes),
        "spill_bytes": spill,
        "scan_bytes": scan,
    }


# Stage-level IO keys from the UI REST API (/api/v1/.../stages). Unlike
# final-plan SQLMetrics, these cover EVERY job a query ran — including
# the persist/count jobs behind cached intermediates (pagerank's
# per-iteration exchanges, LSH's candidate build), which the final
# adaptive plan hides behind InMemoryTableScan (round-13 VERDICT task
# 3) — and their spill counters include shuffle-write spill.
STAGE_IO_KEYS = (
    "shuffleWriteBytes",
    "shuffleReadBytes",
    "inputBytes",
    "memoryBytesSpilled",
    "diskBytesSpilled",
)


def stage_snapshot(spark) -> dict[tuple[int, int], dict] | None:
    """Map (stageId, attemptId) -> stage record from the UI REST API,
    or None when the UI is disabled/unreachable (detection unavailable,
    not zero). get_spark raises spark.ui.retainedStages to 20000 when
    the UI is on, so eviction between snapshots is not a practical
    concern at bench scale."""
    import json as _json
    import urllib.request

    ui = spark.sparkContext.uiWebUrl
    if not ui:
        return None
    app_id = spark.sparkContext.applicationId
    try:
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages", timeout=10
        ) as resp:
            stages = _json.load(resp)
    except Exception:
        return None
    return {(s["stageId"], s["attemptId"]): s for s in stages}


def stage_delta_metrics(spark, before: dict | None) -> dict | None:
    """Aggregate STAGE_IO_KEYS over every stage that appeared since the
    ``before`` snapshot — i.e. all stages of all jobs the measured query
    ran, identified by (stageId, attemptId) rather than cumulative sums
    so eviction of OLD stages cannot skew the delta. None when the UI
    is off (either snapshot unavailable)."""
    after = stage_snapshot(spark)
    if before is None or after is None:
        return None
    new = [s for key, s in after.items() if key not in before]
    out = {k: sum(s.get(k, 0) for s in new) for k in STAGE_IO_KEYS}
    out["n_stages"] = len(new)
    out["max_stage_shuffle_write_bytes"] = max(
        (s.get("shuffleWriteBytes", 0) for s in new), default=0
    )
    return out


_KEY_METRICS = (
    "numOutputRows",
    "numFiles",
    "filesSize",
    "dataSize",
    "shuffleBytesWritten",
    "spillSize",
    "peakMemory",
    "scanTime",
    "aggTime",
)


def format_profile(rows: list[NodeMetrics]) -> str:
    lines = []
    for r in rows:
        picked = {k: v for k, v in r.metrics.items() if k in _KEY_METRICS}
        tail = (
            " | " + ", ".join(f"{k}={v}" for k, v in sorted(picked.items()))
            if picked
            else ""
        )
        lines.append("  " * r.depth + r.name + tail)
    return "\n".join(lines)
