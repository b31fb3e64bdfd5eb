"""Code-cache arm of the pagerank bench-context gap (round 12).

`scripts/pagerank_gap_r12.py` localized the ~+1.8 s bench-context cost
to "inside the JVM session" (GC, checkpoint blocks, and OS page cache
all ruled out). The one named candidate never isolated: JIT code-cache
pressure — Spark whole-stage codegen emits a new class per plan, ~18
queries of codegen can approach the default 240 MB ReservedCodeCacheSize,
and a full cache flips HotSpot to CodeCacheFlushing/re-profiling, which
taxes every subsequent compilation.

Design: ONE process = warmup + arm A (pagerank x2, isolated) + arm C
(full bench-context pass, then pagerank, x2), reporting the JVM
code-cache occupancy via jcmd after the context pass. Run the script
twice from the shell:

    python scripts/codecache_ab_r12.py                    # default JVM
    JAVA_TOOL_OPTIONS="-XX:ReservedCodeCacheSize=512m" \
        python scripts/codecache_ab_r12.py                # bigger JIT cache
    PYSPARK_SUBMIT_ARGS="--conf spark.sql.codegen.cache.maxEntries=5000 \
        pyspark-shell" python scripts/codecache_ab_r12.py # bigger CLASS cache

Round-12 result: jcmd showed the JIT code cache never near full
(72/119 MB profiled, full_count=0) — JIT pressure ruled out — but the
CLASS-cache arm took in-context pagerank from 6.107/6.215 s to
4.628/3.835 s: the gap was Spark's 100-entry compiled-codegen class
cache evicting every query's generated classes across a ~19-query
draw. The knob is now a session.py default (5000).

Round-13 (ADVICE low): arm A always ran before arm C in the same JVM,
so C benefited from strictly more JIT warmup — an order confound. The
script now re-runs arm A after arm C ("A2"): A2-A isolates the warmup
drift, C-A2 is the order-clean eviction effect. Round-13 measurement:
see BASELINE.md "Round-13 order-confound control".
"""

from __future__ import annotations

import json
import os
import subprocess
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


def jvm_pid(spark) -> int | None:
    try:
        jvm = spark.sparkContext._jvm
        return int(
            jvm.java.lang.ProcessHandle.current().pid()
        )
    except Exception:
        return None


def codecache_stats(pid: int | None) -> str:
    if pid is None:
        return "pid-unavailable"
    try:
        out = subprocess.run(
            ["jcmd", str(pid), "Compiler.codecache"],
            capture_output=True, text=True, timeout=30,
        ).stdout
        return " | ".join(
            line.strip() for line in out.splitlines()
            if "CodeHeap" in line or "full_count" in line
        ) or out.strip()[:500]
    except Exception as exc:  # jcmd missing: report, don't fail the arm
        return f"jcmd-failed: {exc}"


def main() -> None:
    spark = get_spark("codecache-ab")
    pid = jvm_pid(spark)
    reg = registry()
    target = reg[TARGET]
    context_qs = {
        n: s for n, s in reg.items()
        if (s.bench or s.bench_tail) and n != TARGET
    }

    from financial_tracker_etl_spark.streaming.pipeline import (
        reset_shared_pipeline,
        staged_request_dir,
    )

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

    opts = " ".join(
        f"{var}={os.environ[var]}"
        for var in ("JAVA_TOOL_OPTIONS", "PYSPARK_SUBMIT_ARGS")
        if os.environ.get(var)
    ) or "(default)"
    a = [timed_pagerank() for _ in range(2)]
    print(json.dumps({"arm": "A_isolated", "sec": a, "opts": opts}),
          flush=True)
    print(json.dumps({"codecache_after_A": codecache_stats(pid)}),
          flush=True)

    c = []
    for _ in range(2):
        context_pass()
        c.append(timed_pagerank())
    print(json.dumps({"arm": "C_context", "sec": c, "opts": opts}),
          flush=True)
    print(json.dumps({"codecache_after_C": codecache_stats(pid)}),
          flush=True)

    # arm A re-run AFTER arm C (round-12 ADVICE low): A always
    # preceding C gives C strictly more JIT/tier-up warmup, so the
    # A-vs-C delta conflates eviction cost with warmup drift. A2-A is
    # the warmup drift alone (same isolated protocol, fully-warm JVM);
    # the eviction effect is C-A2, not C-A.
    a2 = [timed_pagerank() for _ in range(2)]
    print(json.dumps({"arm": "A2_isolated_rerun", "sec": a2,
                      "opts": opts}), flush=True)
    print(json.dumps({"summary": True, "opts": opts, "A": a, "C": c,
                      "A2": a2,
                      "loadavg": list(os.getloadavg())}), flush=True)


if __name__ == "__main__":
    main()
