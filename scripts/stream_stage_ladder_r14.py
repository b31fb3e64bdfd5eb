"""Stage-level shuffle-BYTES column for the streaming traffic ladder.

Completes the round-14 bytes-ladder story for the streaming path:
scripts/stream_ladder_r12.py measures WALL at k-replicated traffic
(8x -> 2.26x, BASELINE.md); this wrapper reuses its exact machinery
(replicated traffic with per-replica symbol rewrite, constant
micro-batch count, unchanged consume pipeline) and wraps each rung in
profile.stage_snapshot/stage_delta_metrics, so we also see total
stage-level shuffleWriteBytes and spill across every micro-batch job
of the run. Linear bytes + sublinear wall = the pipeline shuffles
O(traffic) with no per-key blowup, same argument as the batch bytes
ladder (scripts/stage_ladder_r14.py).

Usage:
    SPARK_GRAFT_UI=1 SPARK_GRAFT_CPUS=32 \
        python scripts/stream_stage_ladder_r14.py [--ks 1,8] \
        [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from financial_tracker_etl_spark.profile import (  # noqa: E402
    stage_delta_metrics,
    stage_snapshot,
)
from financial_tracker_etl_spark.session import get_spark  # noqa: E402

_spec = importlib.util.spec_from_file_location(
    "stream_ladder_r12",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "stream_ladder_r12.py"),
)
_r12 = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_r12)

MB = 1024 * 1024


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ks", default="1,8")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()
    ks = [int(x) for x in args.ks.split(",")]

    spark = get_spark("stream-stage-ladder")
    if stage_snapshot(spark) is None:
        raise SystemExit("UI REST unavailable — run with SPARK_GRAFT_UI=1")

    warm_root = os.path.join(os.path.dirname(args.sf_dir.rstrip("/")), "sf0.001")
    scratch = tempfile.mkdtemp(prefix="ftes_stream_stage_ladder_")
    try:
        if os.path.isdir(warm_root) and warm_root != args.sf_dir.rstrip("/"):
            wdir = os.path.join(scratch, "warm")
            _r12.stage(_r12.replicated_traffic(spark, warm_root, 1), wdir)
            _r12.run_rung(spark, warm_root, wdir)

        out: dict[int, dict] = {}
        for k in ks:
            spark.catalog.clearCache()
            indir = os.path.join(scratch, f"k{k}")
            _r12.stage(_r12.replicated_traffic(spark, args.sf_dir, k), indir)
            before = stage_snapshot(spark)
            rung = _r12.run_rung(spark, args.sf_dir, indir)
            delta = stage_delta_metrics(spark, before)
            if delta is None:
                # transient REST failure mid-run (round-14 ADVICE low):
                # fail loudly instead of TypeError-ing on delta[...]
                raise SystemExit(
                    f"UI REST snapshot failed mid-run (k={k}); re-run"
                )
            rung["stage_shuffle_write_mb"] = round(
                delta["shuffleWriteBytes"] / MB, 2
            )
            rung["stage_spill_mb"] = round(
                (delta["memoryBytesSpilled"] + delta["diskBytesSpilled"]) / MB, 2
            )
            rung["n_stages"] = delta["n_stages"]
            out[k] = rung
            print(json.dumps({"k": k, **rung}), flush=True)

        base, last = out[ks[0]], out[ks[-1]]
        print(
            json.dumps(
                {
                    "summary": True,
                    "k_span": f"{ks[0]}->{ks[-1]}",
                    "wall_ratio": round(last["sec"] / max(base["sec"], 0.01), 2),
                    "bytes_ratio": round(
                        last["stage_shuffle_write_mb"]
                        / max(base["stage_shuffle_write_mb"], 0.01),
                        2,
                    ),
                    "keys_ratio": round(
                        last["state_keys"] / max(base["state_keys"], 1), 2
                    ),
                    "loadavg": list(os.getloadavg()),
                }
            ),
            flush=True,
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
