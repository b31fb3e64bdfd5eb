"""Round-17: per-job timing breakdown of one purchase_graph_pagerank
run (UI REST API), to find where the ~5 s wall actually goes.

Usage: SPARK_GRAFT_UI=1 python scripts/probe_pagerank_jobs_r17.py <sf_dir>
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from financial_tracker_etl_spark.session import get_spark  # noqa: E402
from financial_tracker_etl_spark.queries import registry  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("probe-pagerank-jobs")
    fn = registry()["purchase_graph_pagerank"].fn
    # warmup
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    mark = time.time() * 1000.0
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    jobs = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/jobs")
    )
    import datetime

    def ms(ts: str) -> float:
        return datetime.datetime.strptime(
            ts, "%Y-%m-%dT%H:%M:%S.%fGMT"
        ).replace(tzinfo=datetime.timezone.utc).timestamp() * 1000.0

    rows = []
    for j in jobs:
        st = ms(j["submissionTime"])
        if st < mark - 500:
            continue
        et = ms(j["completionTime"]) if "completionTime" in j else st
        rows.append((st, et, j["jobId"], j.get("description") or j["name"]))
    rows.sort()
    base = rows[0][0] if rows else mark
    print(f"wall {wall:.3f} s, {len(rows)} jobs")
    prev_end = base
    for st, et, jid, name in rows:
        gap = (st - prev_end) / 1000.0
        print(
            f"job {jid}: +{(st - base) / 1000.0:7.3f}s dur {(et - st) / 1000.0:6.3f}s"
            f" gap {gap:6.3f}s  {name[:100]}"
        )
        prev_end = et
    spark.stop()


if __name__ == "__main__":
    main()
