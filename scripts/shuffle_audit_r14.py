"""Full bench-set shuffle/spill audit, round 14 — two detection paths.

Supersedes scripts/shuffle_audit_r13.py, closing its three round-13
ADVICE lows and the round-13 VERDICT task-3 blind spot:

1. Final-plan SQLMetrics walk now dedupes ReusedExchange subtrees
   (profile.plan_io_summary skips ``reused`` nodes), so each physical
   exchange/scan is counted exactly once.
2. The summary line is always emitted: the worst shuffle-to-scan ratio
   uses ``max(..., default=None)`` and degrades to null instead of
   crashing after 19 queries of output.
3. Scope is stated honestly AND widened: plan-walk ``spill_mb`` covers
   operator spill only (sorts/aggs/joins — shuffle-write spill never
   reaches node SQLMetrics); the NEW stage-level path sums
   memory/diskBytesSpilled over every stage of every job the query ran,
   which DOES include shuffle-write spill.

The stage-level path (profile.stage_delta_metrics, UI REST API) is the
task-3 fix: queries whose real exchanges run in jobs behind persisted
intermediates — purchase_graph_pagerank's per-iteration rank shuffles,
minhash_lsh_near_dups' candidate build — report 0 shuffle in the final
adaptive plan (the exchanges hide behind InMemoryTableScan), but their
per-iteration exchange bytes appear in the stage delta, so the audit
table finally measures them directly instead of cross-referencing
older rounds.

Usage: SPARK_GRAFT_UI=1 SPARK_GRAFT_CPUS=32 python scripts/shuffle_audit_r14.py
Prints one JSON line per bench query (19 total at sf0.1) plus a
summary line. stage_* fields are null if the UI is off.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from financial_tracker_etl_spark.profile import (  # noqa: E402
    collect_metrics,
    plan_io_summary,
    stage_delta_metrics,
    stage_snapshot,
)
from financial_tracker_etl_spark.queries import registry  # noqa: E402
from financial_tracker_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
MB = 1024 * 1024


def mb(n: int | None) -> float | None:
    return None if n is None else round(n / MB, 2)


def audit_one(spark, name, spec) -> dict:
    spark.catalog.clearCache()
    before = stage_snapshot(spark)
    rows = collect_metrics(spec.fn(spark, SF_DIR))
    stage = stage_delta_metrics(spark, before)
    plan = plan_io_summary(rows)
    rec = {
        "query": name,
        # final-plan SQLMetrics (deduped): the shape argument
        "shuffle_total_mb": mb(plan["shuffle_total_bytes"]),
        "shuffle_max_exchange_mb": mb(plan["shuffle_max_exchange_bytes"]),
        "n_exchanges": plan["n_exchanges"],
        "operator_spill_mb": mb(plan["spill_bytes"]),
        "scan_mb": mb(plan["scan_bytes"]),
        # stage-level across ALL jobs (null = UI off): the measurement
        "stage_shuffle_write_mb": None,
        "stage_max_stage_shuffle_write_mb": None,
        "stage_spill_mb": None,
        "stage_n": None,
    }
    if stage is not None:
        rec["stage_shuffle_write_mb"] = mb(stage["shuffleWriteBytes"])
        rec["stage_max_stage_shuffle_write_mb"] = mb(
            stage["max_stage_shuffle_write_bytes"]
        )
        rec["stage_spill_mb"] = mb(
            stage["memoryBytesSpilled"] + stage["diskBytesSpilled"]
        )
        rec["stage_n"] = stage["n_stages"]
    return rec


def main() -> None:
    spark = get_spark("shuffle-audit-r14")
    from financial_tracker_etl_spark.streaming.pipeline import (
        reset_shared_pipeline,
        staged_request_dir,
    )

    reset_shared_pipeline()
    staged_request_dir(spark, SF_DIR)  # stage stream traffic off-clock
    out = []
    for name, spec in registry().items():
        if not (spec.bench or spec.bench_tail):
            continue
        rec = audit_one(spark, name, spec)
        out.append(rec)
        print(json.dumps(rec), flush=True)
    worst = max(
        (r for r in out if r["scan_mb"] > 0),
        key=lambda r: r["shuffle_total_mb"] / r["scan_mb"],
        default=None,
    )
    stage_available = all(r["stage_shuffle_write_mb"] is not None for r in out)
    print(
        json.dumps(
            {
                "summary": True,
                "queries": len(out),
                "total_operator_spill_mb": round(
                    sum(r["operator_spill_mb"] for r in out), 2
                ),
                "total_stage_spill_mb": (
                    round(sum(r["stage_spill_mb"] for r in out), 2)
                    if stage_available
                    else None
                ),
                "stage_detection_available": stage_available,
                "max_shuffle_to_scan": (
                    None
                    if worst is None
                    else {
                        "query": worst["query"],
                        "ratio": round(
                            worst["shuffle_total_mb"] / worst["scan_mb"], 3
                        ),
                    }
                ),
                "loadavg": list(os.getloadavg()),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
