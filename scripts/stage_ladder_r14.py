"""Stage-level shuffle-BYTES ladder (round 14).

The wall-clock ladders (BASELINE.md rounds 7/11/13) show the heavy
queries scale sublinearly in data (pagerank 1.57x, minhash 1.77x,
span-dedup 1.9x, asof 1.38x wall at 8x input). This script adds the
missing bytes-level counterpart using the round-14 stage-level
instrumentation (profile.stage_delta_metrics, which sees every job
including the persisted-intermediate iterations the final plan hides):
at k-replicated input, measure total stage-level shuffleWriteBytes and
wall seconds per rung.

Why it matters: if shuffled bytes grow ~k-fold while wall grows far
slower, the sublinearity is idle-core fill + fixed-cost amortization —
the engine genuinely moves O(data) bytes with no quadratic candidate
blowup, the property that transfers to a 1000-executor cluster. If
bytes grew faster than k (e.g. pair-producing dedup exploding), that
would flag a scale-killer the wall-clock rung could mask on an idle
box.

Usage:
    SPARK_GRAFT_UI=1 SPARK_GRAFT_CPUS=32 python scripts/stage_ladder_r14.py \
        [--ks 1,8] [--sf-dir /root/testdata/sf0.1] [names...]
Default queries: the four heavy non-stream laddered queries. One JSON
line per (query, k) plus a ratio summary per query.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from financial_tracker_etl_spark.ladder import _patched_loader, force  # noqa: E402
from financial_tracker_etl_spark.profile import (  # noqa: E402
    stage_delta_metrics,
    stage_snapshot,
)
from financial_tracker_etl_spark.queries import registry  # noqa: E402
from financial_tracker_etl_spark.session import get_spark  # noqa: E402

DEFAULT_QUERIES = [
    "purchase_graph_pagerank",
    "minhash_lsh_near_dups",
    "duplicate_span_stats",
    "asof_quote_join",
]
MB = 1024 * 1024


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", default=None)
    ap.add_argument("--ks", default="1,8")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()
    names = args.names or DEFAULT_QUERIES
    ks = [int(x) for x in args.ks.split(",")]

    spark = get_spark("stage-ladder")
    if stage_snapshot(spark) is None:
        raise SystemExit("UI REST unavailable — run with SPARK_GRAFT_UI=1")
    reg = registry()
    warmup_dir = os.path.join(
        os.path.dirname(args.sf_dir.rstrip("/")), "sf0.001"
    )
    for name in names:
        spec = reg[name]
        if os.path.isdir(warmup_dir):
            force(spec.fn(spark, warmup_dir))  # JIT/codegen priming
        rows = {}
        for k in ks:
            spark.catalog.clearCache()
            with _patched_loader(k):
                before = stage_snapshot(spark)
                t0 = time.perf_counter()
                force(spec.fn(spark, args.sf_dir))
                sec = round(time.perf_counter() - t0, 3)
                stage = stage_delta_metrics(spark, before)
            if stage is None:
                # stage_snapshot swallows transient REST failures and
                # returns None; the startup UI guard only runs once, so
                # indexing unconditionally would TypeError mid-ladder
                # (round-14 ADVICE low)
                raise SystemExit(
                    f"UI REST snapshot failed mid-run (query={name}, k={k}); "
                    "re-run the ladder"
                )
            rec = {
                "query": name,
                "k": k,
                "sec": sec,
                "stage_shuffle_write_mb": round(
                    stage["shuffleWriteBytes"] / MB, 2
                ),
                "stage_spill_mb": round(
                    (stage["memoryBytesSpilled"] + stage["diskBytesSpilled"])
                    / MB,
                    2,
                ),
                "n_stages": stage["n_stages"],
            }
            rows[k] = rec
            print(json.dumps(rec), flush=True)
        k0, k1 = ks[0], ks[-1]
        b0 = rows[k0]["stage_shuffle_write_mb"]
        b1 = rows[k1]["stage_shuffle_write_mb"]
        print(
            json.dumps(
                {
                    "summary": name,
                    "k_span": f"{k0}->{k1}",
                    "bytes_ratio": round(b1 / b0, 2) if b0 else None,
                    "wall_ratio": round(
                        rows[k1]["sec"] / rows[k0]["sec"], 2
                    ),
                    "loadavg": list(os.getloadavg()),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
