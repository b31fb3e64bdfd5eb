"""Reliable-checkpoint knob overhead at bench scale (round-9 task 4).

The knob value-identity matrix proves correctness at test scale; this
measures the knob's documented trade at sf0.1: run the two iterative
graph queries (purchase_graph_pagerank, purchase_graph_bfs_hops) with
the checkpointDir knob UNSET (localCheckpoint cuts, the default) and
SET (reliable DFS checkpoints + ownership reaping), interleaved draws
on one session, draw 0 per mode discarded (JIT), medians reported.

The absolute overhead here understates a real cluster (the "DFS" is
local disk), but the RATIO still prices what the knob buys: per-cut
durability for spot/preemptible fleets vs per-cut write+read cost.

Usage: SPARK_GRAFT_CPUS=32 python scripts/knob_bench_r10.py [draws=4]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from financial_tracker_etl_spark.ext import CHECKPOINT_DIR_CONF  # noqa: E402
from financial_tracker_etl_spark.queries import registry  # noqa: E402
from financial_tracker_etl_spark.session import get_spark  # noqa: E402

QUERIES = ("purchase_graph_pagerank", "purchase_graph_bfs_hops")
SF_DIR = "/root/testdata/sf0.1"


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    draws = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark("knob-bench")
    reg = registry()
    # the knob-ON checkpoint scopes intentionally leave their surviving
    # CHECKPOINT_KEEP frames on disk; the measured frames have no use
    # past this run, so reclaim the whole dir on exit (round-10 ADVICE
    # low: interleaved multi-draw runs stranded checkpoint data)
    knob_dir = tempfile.mkdtemp(prefix="knob_bench_ckpt_")
    try:
        _run(spark, reg, knob_dir, draws)
    finally:
        spark.stop()
        import shutil

        shutil.rmtree(knob_dir, ignore_errors=True)


def _run(spark, reg, knob_dir, draws) -> None:
    times: dict[tuple[str, str], list[float]] = {}
    for q in QUERIES:
        spec = reg[q]
        for i in range(draws + 1):  # +1: draw 0 discarded
            for mode in ("off", "on"):
                if mode == "on":
                    spark.conf.set(CHECKPOINT_DIR_CONF, knob_dir)
                else:
                    spark.conf.unset(CHECKPOINT_DIR_CONF)
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                force(spec.fn(spark, SF_DIR))
                sec = round(time.perf_counter() - t0, 3)
                if i > 0:
                    times.setdefault((q, mode), []).append(sec)
        spark.conf.unset(CHECKPOINT_DIR_CONF)

    out = {}
    for q in QUERIES:
        off = statistics.median(times[(q, "off")])
        on = statistics.median(times[(q, "on")])
        out[q] = {
            "knob_off_median_sec": round(off, 3),
            "knob_on_median_sec": round(on, 3),
            "overhead_ratio": round(on / off, 3),
            "draws_off": times[(q, "off")],
            "draws_on": times[(q, "on")],
        }
    print(
        json.dumps(
            {
                "sf_dir": SF_DIR,
                "draws": draws,
                "loadavg": [round(x, 2) for x in os.getloadavg()],
                "results": out,
            }
        )
    )


if __name__ == "__main__":
    main()
