"""Full bench-set shuffle/spill audit (round 13).

SUPERSEDED in round 14 by scripts/shuffle_audit_r14.py, which dedupes
ReusedExchange subtrees, adds the stage-level REST path (covers jobs
behind persisted intermediates + shuffle-write spill), and never
crashes on an empty max() (the three round-13 ADVICE lows). Kept for
ledger history; run the r14 script.

Earlier rounds audited the 5 most expensive bench queries' runtime
SQLMetrics by hand; this script makes the audit exhaustive and
repeatable: every bench query (headline + tail, 19 total) executed at
sf0.1, final adaptive plan walked via ``profile.collect_metrics``, and
per query we report the numbers that decide scale-safety:

- shuffle_total_mb / shuffle_max_exchange_mb: total bytes written
  across all exchanges and the single largest exchange. The claim "no
  query shuffles more than a small fraction of its input" is the
  100 TB transferability argument — shuffles move keys/signatures/
  aggregates, never the corpus.
- spill_mb: operator spill (sorts/aggs/joins). Must be 0 at sf0.1
  with the 8g default heap (the round-10/12 soaks pin the 2g case).
- scan_mb: parquet bytes actually read (filesSize of scans in the
  final plan) — the denominator for the shuffle ratio.

Usage: SPARK_GRAFT_CPUS=32 python scripts/shuffle_audit_r13.py
Prints one JSON line per query plus a summary line with the max
shuffle-to-scan ratio across the set.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from financial_tracker_etl_spark.profile import collect_metrics  # noqa: E402
from financial_tracker_etl_spark.queries import registry  # noqa: E402
from financial_tracker_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
MB = 1024 * 1024


def audit_one(spark, name, spec) -> dict:
    spark.catalog.clearCache()
    rows = collect_metrics(spec.fn(spark, SF_DIR))
    shuffle_bytes = []
    spill = 0
    scan = 0
    for r in rows:
        m = r.metrics
        if "shuffleBytesWritten" in m:
            shuffle_bytes.append(m["shuffleBytesWritten"])
        spill += m.get("spillSize", 0)
        # scans report filesSize (static estimate) and numFiles; only
        # count leaf scan nodes so exchanges' dataSize isn't conflated
        if r.name.startswith("Scan") and "filesSize" in m:
            scan += m["filesSize"]
    return {
        "query": name,
        "shuffle_total_mb": round(sum(shuffle_bytes) / MB, 2),
        "shuffle_max_exchange_mb": round(max(shuffle_bytes, default=0) / MB, 2),
        "n_exchanges": len(shuffle_bytes),
        "spill_mb": round(spill / MB, 2),
        "scan_mb": round(scan / MB, 2),
    }


def main() -> None:
    spark = get_spark("shuffle-audit")
    from financial_tracker_etl_spark.streaming.pipeline import (
        reset_shared_pipeline,
        staged_request_dir,
    )

    reset_shared_pipeline()
    staged_request_dir(spark, SF_DIR)  # stage stream traffic off-clock
    reg = registry()
    out = []
    for name, spec in reg.items():
        if not (spec.bench or spec.bench_tail):
            continue
        rec = audit_one(spark, name, spec)
        out.append(rec)
        print(json.dumps(rec), flush=True)
    worst = max(
        (r for r in out if r["scan_mb"] > 0),
        key=lambda r: r["shuffle_total_mb"] / r["scan_mb"],
    )
    print(
        json.dumps(
            {
                "summary": True,
                "queries": len(out),
                "total_spill_mb": round(sum(r["spill_mb"] for r in out), 2),
                "max_shuffle_to_scan": {
                    "query": worst["query"],
                    "ratio": round(worst["shuffle_total_mb"] / worst["scan_mb"], 3),
                },
                "loadavg": list(os.getloadavg()),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
