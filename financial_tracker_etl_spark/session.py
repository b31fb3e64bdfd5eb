"""SparkSession factory with scale-oriented defaults.

Single place where execution knobs live so tests / bench / driver share
one configuration. Tuned for local[N] testing but chosen so the same
settings are sane on a 1000-executor cluster:

- AQE on (runtime coalesce, skew-join splitting, dynamic join strategy),
- explicit shuffle partition count (small here; on a real cluster AQE
  coalesces from a high initial number),
- Arrow for any pandas-interop path (vectorized, not row-at-a-time),
- UTC session timezone so timestamp semantics are deterministic and
  match the DuckDB oracle.

Event-time normalization deliberately does NOT live in session conf:
``catalog.load_table("events")`` branches on the dtype Spark actually
loaded (see ``catalog.events_ts_us_col``), so queries behave the same
under the driver's vanilla session as under this factory.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(app_name: str = "financial-tracker-etl-spark") -> SparkSession:
    cpus = default_parallelism()
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            # override knob for partition-count-invariance runs: results
            # must never depend on how many shuffle partitions execute a
            # plan (verified by full differentials at 7 and 90)
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(max(cpus, 32))),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # managed tables (bucketed state) live in scratch space, never the repo
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/ftes_warehouse"),
        )
        .getOrCreate()
    )
