"""Constrained-memory soak (round-9 judge task 3).

The 100x scale claims rest on plan shape; this adds the missing
memory-pressure evidence: run the full bench set (headline + tail) at
sf0.1 with a deliberately small heap — SPARK_GRAFT_DRIVER_MEM=2g, set
by the caller, vs the 8g default; in local mode the driver heap IS the
executor heap, so 2g constrains the whole engine — and record, per
query, pass/fail, wall seconds, and the spill SQLMetrics summed over
the final adaptive plan (spillSize from sorts/aggs/joins, plus the
shuffle-spill metrics where present).

A query that completes by SPILLING under pressure is scale-evidence
(memory-bounded operators degrade to disk instead of OOM); a query
that fails is a fix item. Output: one JSON line per query + a summary
line, for the BASELINE.md round-10 note.

Usage:
    SPARK_GRAFT_DRIVER_MEM=2g SPARK_GRAFT_CPUS=32 \
        python scripts/memsoak_r10.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from financial_tracker_etl_spark.profile import collect_metrics  # noqa: E402
from financial_tracker_etl_spark.queries import registry  # noqa: E402
from financial_tracker_etl_spark.session import get_spark  # noqa: E402

SPILL_KEYS = ("spillSize", "spillRecords", "shuffleSpillSize")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    heap = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
    spark = get_spark("memsoak")
    actual = spark.conf.get("spark.driver.memory")
    print(json.dumps({"soak_heap": actual, "requested": heap, "sf_dir": sf_dir}))

    reg = registry()
    bench = {n: s for n, s in reg.items() if s.bench or s.bench_tail}

    from financial_tracker_etl_spark.streaming.pipeline import staged_request_dir

    staged_request_dir(spark, sf_dir)

    results = []
    for name, spec in bench.items():
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        try:
            rows = collect_metrics(spec.fn(spark, sf_dir), execute=True)
            sec = round(time.perf_counter() - t0, 3)
            spill = sum(
                v
                for r in rows
                for k, v in r.metrics.items()
                if k in SPILL_KEYS and "Records" not in k
            )
            spilling_ops = sorted(
                {
                    r.name
                    for r in rows
                    if any(
                        r.metrics.get(k, 0) > 0
                        for k in SPILL_KEYS
                        if "Records" not in k
                    )
                }
            )
            rec = {
                "query": name,
                "ok": True,
                "sec": sec,
                "spill_bytes": spill,
                "spilling_ops": spilling_ops,
            }
        except Exception as exc:  # OOM surfaces as Py4J/analysis errors
            rec = {
                "query": name,
                "ok": False,
                "sec": round(time.perf_counter() - t0, 3),
                "error": f"{type(exc).__name__}: {str(exc)[:200]}",
            }
        print(json.dumps(rec), flush=True)
        results.append(rec)

    failed = [r["query"] for r in results if not r["ok"]]
    spilled = {
        r["query"]: r["spill_bytes"]
        for r in results
        if r.get("spill_bytes", 0) > 0
    }
    print(
        json.dumps(
            {
                "summary": True,
                "heap": actual,
                "queries": len(results),
                "failed": failed,
                "spilled": spilled,
                "total_spill_bytes": sum(spilled.values()),
                "total_sec": round(sum(r["sec"] for r in results), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
