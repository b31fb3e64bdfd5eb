"""Round-17: purchase_graph_pagerank wall time vs shuffle partition
count. The rank vector is ~16k rows and the edge list ~600k rows at
sf0.1; every iteration stage runs 32 near-empty tasks. Guide §2: size
partitions from data, not from the session constant.

Usage: python scripts/probe_pagerank_parts_r17.py <sf_dir> <draws> [counts...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from financial_tracker_etl_spark.session import get_spark  # noqa: E402
from financial_tracker_etl_spark.queries import registry  # noqa: E402


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    draws = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    counts = [int(x) for x in sys.argv[3:]] or [32, 8, 4]
    spark = get_spark("probe-pagerank-parts")
    fn = registry()["purchase_graph_pagerank"].fn
    key = "spark.sql.shuffle.partitions"
    for n in counts:
        spark.conf.set(key, str(n))
        force(fn(spark, sf_dir))  # warmup this plan shape
        walls = []
        for _ in range(draws):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            force(fn(spark, sf_dir))
            walls.append(round(time.perf_counter() - t0, 3))
        print(
            f"shuffle.partitions={n}: median {statistics.median(walls)} "
            f"min {min(walls)} walls={walls}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
