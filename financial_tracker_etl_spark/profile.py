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

    def walk(node, depth: int) -> None:
        rows.append(NodeMetrics(depth, node.nodeName(), _node_metrics(node)))
        for kid in _subplans(node):
            walk(kid, depth + 1)

    walk(qe.executedPlan(), 0)
    return rows


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
