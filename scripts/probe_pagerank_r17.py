"""Round-17 optimization probe: pagerank lineage-cut cadence A/B.

Usage: python scripts/probe_pagerank_r17.py <sf_dir> <draws>

The driver bench's biggest line is purchase_graph_pagerank (r17
baseline median 6.49 s at sf0.1), flagged driver-bound by the r16
scaling block (ratio 0.8 at 8 vs 32 cores). Each `cut_lineage` inside
ext.graph.pagerank is an EAGER localCheckpoint — a full O(|nodes|)
materialization job — and the default cadence (ckpt_every=2) spends
three of them on a 5-iteration run in addition to the final cut.
PageRank's uncut plan grows LINEARLY in the segment length (p_{i+1}
references p_i exactly once; edges/nodes are cached), unlike BFS whose
frontier appears twice per round, so a 5-iteration uncut segment is a
small plan and the intermediate materializations are pure overhead at
any scale. This probe measures wall time and Spark job count per
cadence on the exact bench query shape.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from financial_tracker_etl_spark.catalog import load_table  # noqa: E402
from financial_tracker_etl_spark.ext.graph import pagerank  # noqa: E402
from financial_tracker_etl_spark.session import get_spark  # noqa: E402


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def purchase_edges(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    base = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("o_custkey", "l_suppkey")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    fwd = base.select(
        (F.col("o_custkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
        "w",
    )
    return fwd.unionByName(
        base.select(
            (F.col("l_suppkey") * 2 + 1).alias("src"),
            (F.col("o_custkey") * 2).alias("dst"),
            "w",
        )
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    draws = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("probe-pagerank-r17")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    cadences = [2, 8]  # current default vs final-cut-only for iters=5
    # warmup both plan shapes once (JIT/codegen out of the numbers)
    for ck in cadences:
        force(
            pagerank(purchase_edges(spark, sf_dir), iters=5, ckpt_every=ck)
            .select("node", "rank_ppm")
        )

    for ck in cadences:
        walls, jobs = [], []
        for d in range(draws):
            spark.catalog.clearCache()
            group = f"pr_ck{ck}_d{d}"
            sc.setJobGroup(group, f"pagerank ckpt_every={ck} draw {d}")
            t0 = time.perf_counter()
            force(
                pagerank(purchase_edges(spark, sf_dir), iters=5, ckpt_every=ck)
                .select("node", "rank_ppm")
            )
            walls.append(round(time.perf_counter() - t0, 3))
            jobs.append(len(tracker.getJobIdsForGroup(group)))
            sc.setJobGroup("", "")
        print(
            f"ckpt_every={ck}: median {statistics.median(walls)} s "
            f"min {min(walls)} jobs/draw={jobs} walls={walls}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
