"""Isolated per-query steady-state medians (round-10 judge task 7).

The uniform-elevation adjudication in BASELINE.md compares a loaded
bench draw against each query's ISOLATED steady state — one query per
process, nothing else contending inside the JVM — but those reference
medians dated from rounds 6-8. This re-measures them: for each query,
a fresh subprocess runs a sf0.001 warmup draw plus one discarded sf0.1
draw (JIT), then N measured sf0.1 draws, and reports the median. The
stream query resets the shared-pipeline memo per draw so every draw
executes the full routed pipeline (same contract as bench.py).

Usage:
    SPARK_GRAFT_CPUS=32 python scripts/isolated_r11.py            # all
    python scripts/isolated_r11.py --one <query> [draws]          # inner
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = (
    "purchase_graph_pagerank",
    "stream_upsert_market_data",
    "minhash_lsh_near_dups",
    "doc_price_indicators",
    "cdc_apply_roundtrip",
    "pricing_summary",  # the zero-diff canary used in box-noise calls
    "top_revenue_customers",
)
SF_DIR = "/root/testdata/sf0.1"
WARMUP_DIR = "/root/testdata/sf0.001"


def _one(name: str, draws: int) -> None:
    from financial_tracker_etl_spark.queries import registry
    from financial_tracker_etl_spark.session import get_spark
    from financial_tracker_etl_spark.streaming.pipeline import (
        reset_shared_pipeline,
        staged_request_dir,
    )

    spark = get_spark(f"isolated-{name}")
    spec = registry()[name]

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    force(spec.fn(spark, WARMUP_DIR))  # JVM + codegen warmup
    staged_request_dir(spark, SF_DIR)  # fixture side, untimed
    secs: list[float] = []
    for i in range(draws + 1):  # draw 0 discarded (sf0.1 JIT tail)
        reset_shared_pipeline()
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        force(spec.fn(spark, SF_DIR))
        if i > 0:
            secs.append(round(time.perf_counter() - t0, 3))
    spark.stop()
    print(
        json.dumps(
            {
                "query": name,
                "draws": secs,
                "median": round(statistics.median(secs), 3),
                "min": round(min(secs), 3),
            }
        )
    )


def main() -> None:
    if "--one" in sys.argv:
        i = sys.argv.index("--one")
        name = sys.argv[i + 1]
        draws = int(sys.argv[i + 2]) if len(sys.argv) > i + 2 else 3
        _one(name, draws)
        return
    results = []
    load0 = [round(x, 2) for x in os.getloadavg()]
    for name in QUERIES:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", name],
            capture_output=True,
            text=True,
            env=os.environ,
        )
        line = [
            ln
            for ln in proc.stdout.splitlines()
            if ln.startswith('{"query"')
        ]
        if proc.returncode != 0 or not line:
            results.append(
                {"query": name, "error": proc.stderr[-300:], "ok": False}
            )
        else:
            results.append(json.loads(line[-1]))
        print(json.dumps(results[-1]), flush=True)
    print(
        json.dumps(
            {
                "summary": True,
                "sf_dir": SF_DIR,
                "loadavg_at_launch": load0,
                "loadavg_at_end": [round(x, 2) for x in os.getloadavg()],
                "medians": {
                    r["query"]: r.get("median") for r in results
                },
            }
        )
    )


if __name__ == "__main__":
    main()
