"""Merge-on-read cost vs delta-log length for LogStructuredState
(round 12 — puts the state layer's compaction cadence on a measured
curve, completing the scale-evidence set: queries and traffic had
ladders, the storage layer didn't).

Two regimes, fixed logical state size, timed warm `read_merged()`:

- disjoint keys (pure inserts): raw rows == logical rows whatever the
  delta count — read cost is flat in file count at local scale (the
  dedup shuffle over logical rows dominates; 64 parquet files are
  nothing for listing).
- overlapping keys (every delta updates ALL keys — the worst update
  amplification): raw rows grow linearly with delta count. This is
  where compaction earns its keep.

Round-12 numbers (local[32], 200k keys, quiet box):
uncompacted 4/16/64 deltas -> 0.807/0.780/0.991 s (sub-linear: the
dedup is a parallel window over the raw union); default cadence
(compact_every=8) at 16/64 deltas -> 0.393/0.503 s — ~2x faster and
BOUNDED for any stream length, because the log never exceeds
compact_every raw batches + one snapshot. At 100 TB the same curve is
the table format's compaction policy (OPTIMIZE cadence vs MERGE
frequency); the miniature demonstrates the same economics end-to-end.

Round-13 (ADVICE low): 16/64 are exact multiples of compact_every, so
those reads saw a pure post-compaction snapshot — best case. Added
mid-cadence points 20/68 (snapshot + 4 pending deltas). Measured:
overlapping 16/20/64/68 compacted -> 0.368/0.510/0.338/0.443 s vs
0.856 s at 64 uncompacted — mid-cadence is ~1.5x the post-compaction
floor, still ~1.7-1.9x faster than uncompacted, bounded by
snapshot + <=7 deltas (full table in BASELINE.md).

Usage: SPARK_GRAFT_CPUS=32 python scripts/state_read_probe_r12.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from financial_tracker_etl_spark.session import get_spark  # noqa: E402
from financial_tracker_etl_spark.streaming.state import (  # noqa: E402
    LogStructuredState,
)

KEYS = 200_000
NO_COMPACT = 10**9


def probe(spark, n_deltas: int, compact_every: int, disjoint: bool) -> dict:
    d = tempfile.mkdtemp(prefix="ftes_state_probe_")
    try:
        st = LogStructuredState(
            spark,
            os.path.join(d, "s"),
            ["k"],
            ["v"],
            write_partitions=2,
            compact_every=compact_every,
        )
        per = KEYS // n_deltas if disjoint else KEYS
        for i in range(n_deltas):
            offset = i * per if disjoint else 0
            st.merge(
                spark.range(per).select(
                    (F.col("id") + offset).alias("k"), F.lit(i).alias("v")
                )
            )
        st.read_merged().count()  # warm
        t0 = time.perf_counter()
        rows = st.read_merged().count()
        return {
            "regime": "disjoint" if disjoint else "overlapping",
            "deltas": n_deltas,
            "compact_every": compact_every if compact_every != NO_COMPACT else None,
            "sec": round(time.perf_counter() - t0, 3),
            "rows": rows,
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)


def main() -> None:
    spark = get_spark("state-read-probe")
    for disjoint in (True, False):
        for nd in (4, 16, 64):
            print(json.dumps(probe(spark, nd, NO_COMPACT, disjoint)), flush=True)
        # 16/64 are exact multiples of compact_every=8, so the timed
        # read sees a pure post-compaction snapshot (best case); 20/68
        # are mid-cadence — snapshot + 4 pending raw deltas — the
        # steady state a reader actually sees between compactions
        # (round-12 ADVICE low)
        for nd in (16, 20, 64, 68):
            print(json.dumps(probe(spark, nd, 8, disjoint)), flush=True)


if __name__ == "__main__":
    main()
