"""Table catalog: parquet readers over the driver testdata.

The reference keeps its catalog implicitly in SQL strings
(reference: etl/jobs/fetch_market_data/fetch_market_data.py:36-56);
here the catalog is explicit. Readers are plain ``spark.read.parquet``
so Catalyst gets native columnar scans with predicate pushdown and
column pruning — the scale path for 100 TB is unchanged code with a
bigger directory behind it.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _ensure_session_defaults(spark: SparkSession) -> None:
    """Queries must not depend on who built the SparkSession (the
    driver harness calls them with its own): pin the runtime-settable
    confs correctness relies on — UTC so timestamp_ntz casts are
    stable against the DuckDB oracle, and Arrow for the pandas-interop
    operators. The pin lives HERE (first catalog touch) and in
    session.get_spark — never inside an individual table branch,
    where flipping a session-global conf would be an invisible side
    effect of whichever query ran first (round-1 advisor)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")


def events_ts_us_col(ts_dtype: str):
    """Column expression converting the raw ``events.ts`` column to
    integer microseconds-since-epoch, branching on the dtype Spark
    actually loaded — NOT on an assumed parquet physical type. The
    testdata generator has shipped the column both as TIMESTAMP(NANOS)
    (loads as ``bigint`` ns under nanosAsLong) and TIMESTAMP(MICROS)
    (loads as ``timestamp``/``timestamp_ntz``); a conf-based assumption
    broke the whole events family in round 2. With the session timezone
    pinned to UTC the ntz→timestamp cast is value-preserving, so
    ``unix_micros`` yields the exact stored microsecond value."""
    from pyspark.sql import functions as F

    if ts_dtype in ("bigint", "long"):
        return F.expr("ts div 1000")
    if ts_dtype in ("timestamp", "timestamp_ntz"):
        return F.unix_micros(F.col("ts").cast("timestamp"))
    raise TypeError(f"events.ts loaded as unsupported dtype {ts_dtype!r}")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; have {TABLES}")
    _ensure_session_defaults(spark)
    if name == "events":
        # Normalize event time to integer microseconds (ts_us): integer
        # time arithmetic is the cross-engine-deterministic path (DuckDB
        # epoch_us agrees exactly), independent of how the parquet
        # timestamp column resolves in this environment.
        df = spark.read.parquet(table_path(sf_dir, name))
        ts_dtype = dict(df.dtypes)["ts"]
        return df.withColumn("ts_us", events_ts_us_col(ts_dtype)).drop("ts")
    return spark.read.parquet(table_path(sf_dir, name))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
