"""Round-16 optimization: time EVERY registry query with the noop sink.

Usage: python scripts/registry_profile_r16.py [sf_dir] [draws] [out.json]

Methodology mirrors bench.py (guide §1.4): each query is forced
end-to-end with the noop sink; one full warmup draw at the target sf
amortizes JVM/codegen JIT; the shared streaming pipeline memo is reset
per draw so stream queries measure execution, not merge-on-read.
Per-query MEDIANS over the measured draws are the adjudication series.
Output: JSON {query: {"median": s, "min": s, "draws": [..]}} sorted by
median descending.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from financial_tracker_etl_spark.queries import registry  # noqa: E402
from financial_tracker_etl_spark.session import get_spark  # noqa: E402
from financial_tracker_etl_spark.streaming.pipeline import (  # noqa: E402
    reset_shared_pipeline,
    staged_request_dir,
)


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    draws = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    out_path = (
        sys.argv[3]
        if len(sys.argv) > 3
        else "/tmp/registry_profile_r16.json"
    )
    spark = get_spark("registry-profile-r16")
    reg = registry()

    # warmup draw: compile every plan once (JIT, parquet footers)
    reset_shared_pipeline()
    for name, spec in reg.items():
        spark.sparkContext.setJobDescription(f"warmup:{name}")
        force(spec.fn(spark, sf_dir))
    staged_request_dir(spark, sf_dir)

    all_draws: list[dict[str, float]] = []
    for d in range(draws):
        reset_shared_pipeline()
        timings: dict[str, float] = {}
        for name, spec in reg.items():
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"draw{d}:{name}")
            t0 = time.perf_counter()
            force(spec.fn(spark, sf_dir))
            timings[name] = round(time.perf_counter() - t0, 3)
        all_draws.append(timings)
        print(
            f"# draw {d}: total {round(sum(timings.values()), 1)} s",
            file=sys.stderr,
        )

    out = {
        name: {
            "median": round(
                statistics.median(d[name] for d in all_draws), 3
            ),
            "min": round(min(d[name] for d in all_draws), 3),
            "draws": [d[name] for d in all_draws],
        }
        for name in reg
    }
    ranked = dict(
        sorted(out.items(), key=lambda kv: -kv[1]["median"])
    )
    with open(out_path, "w") as f:
        json.dump(ranked, f, indent=1)
    total_med = round(sum(v["median"] for v in out.values()), 2)
    print(f"# total (sum of medians): {total_med} s over {len(out)} queries")
    for name, v in list(ranked.items())[:30]:
        print(f"{v['median']:8.3f}  {name}")
    spark.stop()


if __name__ == "__main__":
    main()
