"""Round-16 optimization: isolated multi-draw probe for a SUBSET of
registry queries, with per-draw hypervisor-steal sampling.

Usage: python scripts/query_probe_r16.py <sf_dir> <draws> <query> [query...]

The full-registry profiler (registry_profile_r16.py) ranks hotspots but
its 150-query draws take ~4-7 min each, long enough that this box's
bursty co-tenant contaminates whole blocks of consecutive queries
(see OPTIMIZATION_r16.md, "Post-change measurement quality").
Adjudicating a single change needs the opposite trade: few queries,
many short draws, steal recorded per draw so contaminated draws can be
discarded. Methodology per the optimization guide: noop-sink forcing
(§1.4), job-description labels (§1.5), shared-pipeline memo reset per
draw so stream queries measure execution rather than merge-on-read.
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
)


def _cpu_ticks() -> tuple[int, int]:
    """(steal_ticks, total_ticks) from /proc/stat, or (0, 0) off-Linux."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()[1:]
        vals = [int(x) for x in parts]
        return (vals[7] if len(vals) > 7 else 0), sum(vals)
    except OSError:
        return 0, 0


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    if len(sys.argv) < 4:
        sys.exit(__doc__)
    sf_dir, draws, names = sys.argv[1], int(sys.argv[2]), sys.argv[3:]
    reg = registry()
    unknown = [n for n in names if n not in reg]
    if unknown:
        sys.exit(f"unknown queries: {unknown} (names are exact; see registry)")

    spark = get_spark("query-probe-r16")
    # warmup: compile each probed plan once (JIT, parquet footers)
    reset_shared_pipeline()
    for n in names:
        spark.sparkContext.setJobDescription(f"warmup:{n}")
        force(reg[n].fn(spark, sf_dir))

    out: dict[str, dict] = {n: {"draws": [], "steal_pct": []} for n in names}
    for d in range(draws):
        reset_shared_pipeline()
        for n in names:
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"draw{d}:{n}")
            s0, t0 = _cpu_ticks()
            w0 = time.perf_counter()
            force(reg[n].fn(spark, sf_dir))
            wall = time.perf_counter() - w0
            s1, t1 = _cpu_ticks()
            steal = round(100.0 * (s1 - s0) / max(1, t1 - t0), 2)
            out[n]["draws"].append(round(wall, 3))
            out[n]["steal_pct"].append(steal)
    for n, v in out.items():
        quiet = [
            w
            for w, s in zip(v["draws"], v["steal_pct"])
            if s < 1.0
        ] or v["draws"]
        v["median"] = round(statistics.median(v["draws"]), 3)
        v["median_quiet"] = round(statistics.median(quiet), 3)
        v["min"] = round(min(v["draws"]), 3)
        print(
            f"{n}: median {v['median']} s "
            f"(quiet-draws median {v['median_quiet']}, min {v['min']}) "
            f"draws={v['draws']} steal%={v['steal_pct']}"
        )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
