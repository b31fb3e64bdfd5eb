"""Round-17: per-job timing breakdown of ONE registry query via the UI
REST API — where does the wall time go (which jobs, what gaps).

Usage: python scripts/probe_jobs_r17.py <query> [sf_dir]
"""

from __future__ import annotations

import datetime
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_UI", "1")

from financial_tracker_etl_spark.session import get_spark  # noqa: E402
from financial_tracker_etl_spark.queries import registry  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("probe-jobs-r17")
    fn = registry()[name].fn
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warmup
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
        rows.append((st, et, j["jobId"], j.get("description") or j["name"],
                     j.get("numTasks", 0)))
    rows.sort()
    base = rows[0][0] if rows else mark
    print(f"{name}: wall {wall:.3f} s, {len(rows)} jobs")
    prev_end = base
    for st, et, jid, desc, ntasks in rows:
        print(
            f"job {jid}: +{(st - base) / 1000.0:7.3f}s dur {(et - st) / 1000.0:6.3f}s"
            f" gap {(st - prev_end) / 1000.0:6.3f}s tasks {ntasks:4d}  {desc[:80]}"
        )
        prev_end = et
    spark.stop()


if __name__ == "__main__":
    main()
