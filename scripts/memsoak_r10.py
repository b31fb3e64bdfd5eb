"""Constrained-memory soak (round-9 judge task 3).

The 100x scale claims rest on plan shape; this adds the missing
memory-pressure evidence: run the full bench set (headline + tail) at
sf0.1 with a deliberately small heap — SPARK_GRAFT_DRIVER_MEM=2g, set
by the caller, vs the 8g default; in local mode the driver heap IS the
executor heap, so 2g constrains the whole engine — and record, per
query, pass/fail, wall seconds, and the spill SQLMetrics summed over
the final adaptive plan (spillSize from sorts/aggs/joins, plus the
shuffle-spill metrics where present).

A query that completes by SPILLING under pressure is scale-evidence
(memory-bounded operators degrade to disk instead of OOM); a query
that fails is a fix item. Output: one JSON line per query + a summary
line, for the BASELINE.md round-10 note.

Usage:
    SPARK_GRAFT_DRIVER_MEM=2g SPARK_GRAFT_CPUS=32 SPARK_GRAFT_UI=1 \
        python scripts/memsoak_r10.py [sf_dir]
    ... --probe   # detection-validity: force a sort spill, show it
                  # through BOTH paths (SQLMetrics + task-level REST)

SPARK_GRAFT_UI=1 enables the Spark UI so task-level spill is readable
from the REST API; without it task_spill_bytes is null (unavailable).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from financial_tracker_etl_spark.profile import collect_metrics  # noqa: E402
from financial_tracker_etl_spark.queries import registry  # noqa: E402
from financial_tracker_etl_spark.session import get_spark  # noqa: E402

# node-level SQLMetrics spill keys (sort/agg/join operators).
# Shuffle-WRITE spill never appears in per-node SQLMetrics — it lands
# in task-level memoryBytesSpilled/diskBytesSpilled (round-10 ADVICE
# low) — so the soak also snapshots cumulative task-level spill via
# the UI REST API (/api/v1/.../stages) around each query and reports
# the delta; together the two passes cover operator AND shuffle spill.
SPILL_KEYS = ("spillSize", "spillRecords")


def task_spill_totals(spark) -> tuple[int, int] | None:
    """Cumulative task-level (memoryBytesSpilled, diskBytesSpilled)
    summed over every stage of this app, from the local UI REST API.
    None when the UI is disabled (detection unavailable, not zero)."""
    import urllib.request

    ui = spark.sparkContext.uiWebUrl
    if not ui:
        return None
    app_id = spark.sparkContext.applicationId
    try:
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages", timeout=10
        ) as resp:
            stages = json.load(resp)
    except Exception:
        return None
    return (
        sum(s.get("memoryBytesSpilled", 0) for s in stages),
        sum(s.get("diskBytesSpilled", 0) for s in stages),
    )


def task_spill_delta(
    before: tuple[int, int] | None, after: tuple[int, int] | None
) -> list[int] | None:
    """Per-query [memory, disk] task-spill delta, or None when
    detection is unavailable OR invalid. A NEGATIVE delta means the UI
    evicted stages between the snapshots (the stages list is bounded
    by spark.ui.retainedStages), so the cumulative sums are no longer
    comparable — report detection-invalid rather than a silent wrong
    'no spill' (round-11 ADVICE low; get_spark also raises
    retainedStages to 20000 whenever the UI is on)."""
    if before is None or after is None:
        return None
    delta = [a - b for a, b in zip(after, before)]
    if any(d < 0 for d in delta):
        return None
    return delta


def probe() -> None:
    """Force a memory-overflow sort (20M rows into 1 partition under
    the small heap) and report the spill through BOTH detection paths,
    proving the soak's zeros mean 'fits in memory' for operator AND
    task-level (shuffle) spill alike."""
    from pyspark.sql import functions as F

    spark = get_spark("memsoak-probe")
    before = task_spill_totals(spark)
    df = (
        spark.range(20_000_000)
        .withColumn("pad", F.md5(F.col("id").cast("string")))
        .repartition(1)
        .sortWithinPartitions("pad")
    )
    rows = collect_metrics(df, execute=True)
    op_spill = sum(
        v
        for r in rows
        for k, v in r.metrics.items()
        if k == "spillSize"
    )
    after = task_spill_totals(spark)
    task_delta = task_spill_delta(before, after)
    print(
        json.dumps(
            {
                "probe": True,
                "heap": spark.conf.get("spark.driver.memory"),
                "operator_spill_bytes": op_spill,
                "task_spill_bytes": task_delta,
            }
        )
    )


def main() -> None:
    if "--probe" in sys.argv:
        probe()
        return
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    heap = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
    spark = get_spark("memsoak")
    actual = spark.conf.get("spark.driver.memory")
    print(json.dumps({"soak_heap": actual, "requested": heap, "sf_dir": sf_dir}))

    reg = registry()
    bench = {n: s for n, s in reg.items() if s.bench or s.bench_tail}

    from financial_tracker_etl_spark.streaming.pipeline import staged_request_dir

    staged_request_dir(spark, sf_dir)

    results = []
    for name, spec in bench.items():
        spark.catalog.clearCache()
        task_before = task_spill_totals(spark)
        t0 = time.perf_counter()
        try:
            rows = collect_metrics(spec.fn(spark, sf_dir), execute=True)
            sec = round(time.perf_counter() - t0, 3)
            task_after = task_spill_totals(spark)
            task_spill = task_spill_delta(task_before, task_after)
            spill = sum(
                v
                for r in rows
                for k, v in r.metrics.items()
                if k in SPILL_KEYS and "Records" not in k
            )
            spilling_ops = sorted(
                {
                    r.name
                    for r in rows
                    if any(
                        r.metrics.get(k, 0) > 0
                        for k in SPILL_KEYS
                        if "Records" not in k
                    )
                }
            )
            rec = {
                "query": name,
                "ok": True,
                "sec": sec,
                "spill_bytes": spill,
                "spilling_ops": spilling_ops,
                # [memoryBytesSpilled, diskBytesSpilled] delta across
                # this query's stages; null = UI REST unavailable or
                # detection-invalid (stage eviction between snapshots)
                "task_spill_bytes": task_spill,
            }
        except Exception as exc:  # OOM surfaces as Py4J/analysis errors
            rec = {
                "query": name,
                "ok": False,
                "sec": round(time.perf_counter() - t0, 3),
                "error": f"{type(exc).__name__}: {str(exc)[:200]}",
            }
        print(json.dumps(rec), flush=True)
        results.append(rec)

    failed = [r["query"] for r in results if not r["ok"]]
    spilled = {
        r["query"]: r["spill_bytes"]
        for r in results
        if r.get("spill_bytes", 0) > 0
    }
    task_spilled = {
        r["query"]: r["task_spill_bytes"]
        for r in results
        if r.get("task_spill_bytes") and any(r["task_spill_bytes"])
    }
    task_detection = all(
        r.get("task_spill_bytes") is not None for r in results if r["ok"]
    )
    print(
        json.dumps(
            {
                "summary": True,
                "heap": actual,
                "queries": len(results),
                "failed": failed,
                "spilled": spilled,
                "total_spill_bytes": sum(spilled.values()),
                "task_spilled": task_spilled,
                "task_level_detection_available": task_detection,
                "total_sec": round(sum(r["sec"] for r in results), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
