"""Round-7 closing diagnostics: isolated draws of the three queries
elevated in today's bench sequence vs their round-6 records
(minhash_lsh_near_dups 2.97 s, stream_upsert_market_data 4.87 s,
doc_price_indicators 1.98 s) to separate tree regression from bench-
sequence/box state. Draw 0 is JIT warmup, discarded."""
from __future__ import annotations

import json
import time

from financial_tracker_etl_spark.ladder import force
from financial_tracker_etl_spark.queries import registry
from financial_tracker_etl_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"


def loadavg() -> str:
    with open("/proc/loadavg") as f:
        return f.read().split()[0]


spark = get_spark("redraw2-r7")
reg = registry()

for name in ("minhash_lsh_near_dups", "doc_price_indicators", "stream_upsert_market_data"):
    for i in range(4):
        spark.catalog.clearCache()
        if name.startswith("stream_"):
            # the shared pipeline memoizes per (app, sf_dir); clear so
            # each draw re-runs the full routed pipeline
            from financial_tracker_etl_spark.streaming import pipeline

            pipeline._CACHE.clear()
        t0 = time.monotonic()
        force(reg[name].fn(spark, SF_DIR))
        dt = round(time.monotonic() - t0, 3)
        print(json.dumps({"q": name, "draw": i, "sec": dt, "load1": loadavg()}), flush=True)
