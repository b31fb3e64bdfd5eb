"""Pagerank bench-context gap probe (round-12, VERDICT r11 task 7).

Standing question: `purchase_graph_pagerank` reads ~3.7 s isolated
(fresh process, quiet box — BASELINE.md round-11 table) but 5.6-6.4 s
inside a bench draw. Round 11 ruled out GC pressure and lingering
localCheckpoint blocks. Remaining candidates:

  (a) OS page cache / dirty-page writeback: the ~18 bench queries
      before pagerank write shuffle + checkpoint files; their
      writeback could compete with pagerank's IO, and their reads
      could evict the input parquet from page cache.
  (b) Pure in-session JVM context cost (code cache, fragmented
      Tungsten pools, accumulated broadcast/cleanup work) — not
      attributable to any one subsystem.

Design — four arms in ONE process (like a bench draw), after the
standard sf0.001 warmup; `spark.catalog.clearCache()` before every
measured run (bench semantics):

  A  isolated-repeat: pagerank x3 with nothing else in the session
     (expect ~isolated table if in-session context is the cost).
  B  drop-caches-isolated: sync + drop_caches before each of x2
     pagerank runs. If page cache of the INPUT mattered, these runs
     are slow; if they stay fast, (a)'s read side is ruled out.
  C  context: one full pass over the other bench queries, then
     pagerank x1, repeated x2 (expect ~6 s if context reproduces).
  D  context+flush: same as C but sync + drop_caches between the
     context pass and pagerank. If D ~= A while C is slow, the
     mechanism is (a) writeback/page-cache contention; if D ~= C,
     the cost lives inside the JVM session (b).

drop_caches requires root (`/proc/sys/vm/drop_caches`); arms B/D
degrade to "skipped" when unavailable.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from financial_tracker_etl_spark.queries import registry  # noqa: E402
from financial_tracker_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARMUP = "/root/testdata/sf0.001"
TARGET = "purchase_graph_pagerank"


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def drop_caches() -> bool:
    try:
        os.sync()
        with open("/proc/sys/vm/drop_caches", "w") as f:
            f.write("3\n")
        return True
    except OSError:
        return False


def main() -> None:
    spark = get_spark("pagerank-gap")
    reg = registry()
    target = reg[TARGET]
    context_qs = {
        n: s
        for n, s in reg.items()
        if (s.bench or s.bench_tail) and n != TARGET
    }

    from financial_tracker_etl_spark.streaming.pipeline import (
        reset_shared_pipeline,
        staged_request_dir,
    )

    # standard bench warmup: every query once at sf0.001
    for spec in list(context_qs.values()) + [target]:
        force(spec.fn(spark, WARMUP))
    staged_request_dir(spark, SF_DIR)

    def timed_pagerank() -> float:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        force(target.fn(spark, SF_DIR))
        return round(time.perf_counter() - t0, 3)

    def context_pass() -> None:
        reset_shared_pipeline()
        for spec in context_qs.values():
            spark.catalog.clearCache()
            force(spec.fn(spark, SF_DIR))

    out: dict[str, list] = {"A_isolated": [], "B_dropcache": [],
                            "C_context": [], "D_context_flush": []}

    for _ in range(3):
        out["A_isolated"].append(timed_pagerank())
    print(json.dumps({"arm": "A_isolated", "sec": out["A_isolated"]}),
          flush=True)

    can_drop = drop_caches()
    if can_drop:
        for _ in range(2):
            drop_caches()
            out["B_dropcache"].append(timed_pagerank())
    print(json.dumps({"arm": "B_dropcache", "sec": out["B_dropcache"],
                      "available": can_drop}), flush=True)

    for _ in range(2):
        context_pass()
        out["C_context"].append(timed_pagerank())
    print(json.dumps({"arm": "C_context", "sec": out["C_context"]}),
          flush=True)

    if can_drop:
        for _ in range(2):
            context_pass()
            drop_caches()
            out["D_context_flush"].append(timed_pagerank())
    print(json.dumps({"arm": "D_context_flush",
                      "sec": out["D_context_flush"],
                      "available": can_drop}), flush=True)

    print(json.dumps({"summary": True, "loadavg": list(os.getloadavg()),
                      **{k: v for k, v in out.items()}}), flush=True)


if __name__ == "__main__":
    main()
