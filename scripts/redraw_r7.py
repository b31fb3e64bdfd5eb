"""Round-7 task 3: isolated quiet-box re-draws of the two round-6
driver-bench regressions.

- purchase_graph_pagerank 5.13->5.84 s in the round-6 driver draw: the
  ckpt-cadence change (1 -> every 2nd iteration) landed that round, so
  draw BOTH cadences in isolation to separate the change from box
  noise.
- embedding_topk_cosine 0.753->1.058 s: code untouched in round 6,
  historic band 0.75-1.2 s — draw to pin noise vs real.

Prints one JSON line per draw; loadavg sampled at each draw.
"""
from __future__ import annotations

import json
import time

from pyspark.sql import functions as F

from financial_tracker_etl_spark.catalog import load_table
from financial_tracker_etl_spark.ladder import force
from financial_tracker_etl_spark.queries import registry
from financial_tracker_etl_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"
DRAWS = 4  # first is JIT warmup, discard


def loadavg() -> str:
    with open("/proc/loadavg") as f:
        return f.read().split()[0]


def draw(label: str, fn) -> None:
    for i in range(DRAWS):
        spark.catalog.clearCache()
        t0 = time.monotonic()
        force(fn())
        dt = round(time.monotonic() - t0, 3)
        print(json.dumps({"q": label, "draw": i, "sec": dt, "load1": loadavg()}), flush=True)


spark = get_spark("redraw-r7")
reg = registry()

# pagerank at both cadences: rebuild the exact query-edge construction
# (symmetrized purchase graph, queries/analytics.py:_q_purchase_pagerank)
# and call ext.graph.pagerank directly so only ckpt_every differs
# between the two labels.
from financial_tracker_etl_spark.ext.graph import pagerank  # noqa: E402
from financial_tracker_etl_spark.queries.analytics import (  # noqa: E402
    _PAGERANK_DAMPING_PPM,
    _PAGERANK_ITERS,
)


def purchase_edges():
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
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


for cadence in (1, 2):
    draw(
        f"pagerank_ckpt{cadence}",
        lambda c=cadence: pagerank(
            purchase_edges(),
            iters=_PAGERANK_ITERS,
            damping_ppm=_PAGERANK_DAMPING_PPM,
            ckpt_every=c,
        ),
    )

draw("purchase_graph_pagerank", lambda: reg["purchase_graph_pagerank"].fn(spark, SF_DIR))
draw("embedding_topk_cosine", lambda: reg["embedding_topk_cosine"].fn(spark, SF_DIR))
