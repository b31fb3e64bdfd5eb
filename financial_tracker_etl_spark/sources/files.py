"""File-format ingestion surface (SURVEY.md §2.A extension): the same
catalog tables from CSV / JSON-lines drop directories, with the three
properties a production ingest needs and ``inferSchema`` forfeits:

- **Pinned schemas.** The reader takes an explicit ``StructType``
  (normally probed from the parquet twin) — inference is a full extra
  pass over the data AND nondeterministic under schema drift, both
  disqualifying at 100 TB.
- **Explicit corrupt-row policy.** ``FAILFAST`` for pipelines where a
  bad row means a broken producer (reference semantics: required-field
  validation raises, P1); ``PERMISSIVE`` with a named
  ``_corrupt_record`` column for dead-letter flows (ST4) — the caller
  chooses, nothing is silently dropped.
- **Deterministic timestamp handling.** One pinned format string, UTC
  session — round-trips are value-exact, not locale-dependent.

Layout stays columnar the moment Spark reads it; a CSV scan still
prunes columns (Spark pushes the projection into the parser).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, types as T

TIMESTAMP_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"
CORRUPT_COL = "_corrupt_record"


def read_csv_table(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    mode: str = "FAILFAST",
) -> DataFrame:
    """CSV with header, pinned schema, explicit bad-row mode."""
    reader = (
        spark.read.schema(_with_corrupt(schema, mode))
        .option("header", "true")
        .option("timestampNTZFormat", TIMESTAMP_FMT)
        .option("timestampFormat", TIMESTAMP_FMT)
        .option("mode", mode)
    )
    if mode == "PERMISSIVE":
        reader = reader.option("columnNameOfCorruptRecord", CORRUPT_COL)
    return reader.csv(path)


def read_jsonl_table(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    mode: str = "FAILFAST",
) -> DataFrame:
    """JSON-lines with pinned schema, explicit bad-row mode."""
    reader = (
        spark.read.schema(_with_corrupt(schema, mode))
        .option("timestampNTZFormat", TIMESTAMP_FMT)
        .option("timestampFormat", TIMESTAMP_FMT)
        .option("mode", mode)
    )
    if mode == "PERMISSIVE":
        reader = reader.option("columnNameOfCorruptRecord", CORRUPT_COL)
    return reader.json(path)


def _with_corrupt(schema: T.StructType, mode: str) -> T.StructType:
    """PERMISSIVE needs the corrupt-record column IN the schema; adding
    it unconditionally would change FAILFAST's shape."""
    if mode != "PERMISSIVE" or CORRUPT_COL in schema.fieldNames():
        return schema
    return T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], fmt: str = "parquet"
) -> None:
    """Hive-style partitioned layout (the warehouse landing shape):
    one directory level per partition column. At 100 TB this is what
    turns a date/source filter into directory pruning — the scan never
    lists, let alone reads, non-matching partitions (PartitionFilters
    in the plan, asserted by tests/test_sources.py)."""
    df.write.mode("overwrite").partitionBy(*partition_cols).format(fmt).save(path)
