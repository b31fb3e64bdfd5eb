"""Traffic scale-ladder for the routed streaming pipeline (round-12
judge task 6 — the round-4 ad-hoc method, now a persistent script).

Method (identical to the round-4 measurement recorded in BASELINE.md):
replay k-replicated request traffic through the UNCHANGED consume
pipeline (`run_routed_pipeline`, via its `input_dir` harness hook).
Each replica rewrites every symbol inside the JSON payload
(`"symbol":"ABC"` -> `"symbol":"ABCr<i>x"`), so merge keys and final
state grow exactly k-fold like genuinely new traffic — never hot-key
updates of the base symbols. Micro-batch COUNT is held constant
(6 files / 2 per trigger = 3 batches): at 100 TB you grow batch SIZE,
not batch count, for a fixed trigger cadence. Seeding is off so the
constant-size seed copy doesn't dilute the slope.

Reported per rung: wall-clock for the full pipeline run (classify +
merges + completions) and the summed final state key count, which must
come out exactly k * base — the built-in check that replicas really
created new keys.

Usage:
    SPARK_GRAFT_CPUS=32 python scripts/stream_ladder_r12.py \
        [--ks 1,4,8] [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time
from functools import reduce

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: E402

from financial_tracker_etl_spark.session import get_spark  # noqa: E402
from financial_tracker_etl_spark.streaming import pipeline as pl  # noqa: E402


def replicated_traffic(spark: SparkSession, sf_dir: str, k: int) -> DataFrame:
    """The staged request traffic unioned k times, every symbol inside
    each JSON payload rewritten per replica (suffix ``r<i>x`` keeps the
    symbol matching the payload's quoted-string shape)."""
    base = pl.request_messages(spark, sf_dir)
    parts = [base]
    for i in range(1, k):
        parts.append(
            base.withColumn(
                "payload",
                F.regexp_replace(
                    F.col("payload"),
                    r'("symbol"\s*:\s*"[^"]+)',
                    rf"$1r{i}x",
                ),
            )
        )
    return reduce(lambda a, b: a.unionByName(b), parts)


def stage(df: DataFrame, path: str, n_files: int = 6) -> None:
    df.repartition(n_files, F.col("payload")).write.mode("overwrite").json(path)


def run_rung(spark: SparkSession, sf_dir: str, input_dir: str) -> dict:
    work = tempfile.mkdtemp(prefix="ftes_stream_ladder_")
    try:
        t0 = time.perf_counter()
        res = pl.run_routed_pipeline(
            spark,
            sf_dir,
            work_dir=work,
            seed_market_state=False,
            input_dir=input_dir,
        )
        # final merged-state read is part of what the registry stream
        # query pays; include it so rungs match the benched semantics
        keys = sum(res.state_df(t).count() for t in res.states)
        sec = round(time.perf_counter() - t0, 2)
        return {"sec": sec, "state_keys": keys, "batches": res.n_batches}
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ks", default="1,4,8")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()
    ks = [int(x) for x in args.ks.split(",")]

    spark = get_spark("stream-ladder")
    # JIT/codegen warmup on the smallest sibling scale
    warm_root = os.path.join(
        os.path.dirname(args.sf_dir.rstrip("/")), "sf0.001"
    )
    scratch = tempfile.mkdtemp(prefix="ftes_stream_ladder_in_")
    try:
        if os.path.isdir(warm_root) and warm_root != args.sf_dir.rstrip("/"):
            wdir = os.path.join(scratch, "warm")
            stage(replicated_traffic(spark, warm_root, 1), wdir)
            run_rung(spark, warm_root, wdir)

        out: dict[int, dict] = {}
        for k in ks:
            spark.catalog.clearCache()
            # traffic staging is the fixture/broker side — excluded
            # from the timed region, like staged_request_dir in bench
            indir = os.path.join(scratch, f"k{k}")
            stage(replicated_traffic(spark, args.sf_dir, k), indir)
            out[k] = run_rung(spark, args.sf_dir, indir)
            print(json.dumps({"k": k, **out[k]}), flush=True)

        base = out[ks[0]]
        print(
            json.dumps(
                {
                    "summary": True,
                    "wallclock_last_over_first": round(
                        out[ks[-1]]["sec"] / max(base["sec"], 0.01), 2
                    ),
                    "keys_last_over_first": round(
                        out[ks[-1]]["state_keys"]
                        / max(base["state_keys"], 1),
                        2,
                    ),
                }
            ),
            flush=True,
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
