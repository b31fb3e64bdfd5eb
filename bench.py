"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": sf}.

Each query is forced end-to-end with a noop sink (full computation, no
driver-side collect). A warmup run of the flagship amortizes JVM/codegen
startup out of the numbers.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from financial_tracker_etl_spark.queries import registry  # noqa: E402
from financial_tracker_etl_spark.session import get_spark  # noqa: E402


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark("bench")
    reg = registry()
    bench_queries = {n: s for n, s in reg.items() if s.bench}

    # warmup: JVM + codegen + parquet footer reads. Pinned to the
    # flagship — NOT registry order, which round 2 put the stream
    # pipeline first: warming up with the pipeline would populate its
    # shared-run cache and credit the measured stream query with ~0 s.
    force(reg["flagship_historical_repair"].fn(spark, sf_dir))
    # streaming-machinery warmup (JSON file source, from_json codegen,
    # checkpoint plumbing): one tiny index tick at the SMALLEST sf —
    # different shared-pipeline cache key and topic subset, so the
    # measured stream query still executes its full consume loop.
    from financial_tracker_etl_spark.streaming.scheduler import run_index_tick

    run_index_tick(spark, "/root/testdata/sf0.001")

    timings: dict[str, float] = {}
    for name, spec in bench_queries.items():
        t0 = time.perf_counter()
        force(spec.fn(spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
