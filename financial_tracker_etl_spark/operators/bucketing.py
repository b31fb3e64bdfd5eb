"""Bucketed state tables: the co-located-merge path at scale.

The keyed upsert (operators/upsert.py) costs one shuffle on the merge
key per batch. For a state table merged continuously at 100 TB even
that is worth deleting: persist the table bucketed (+sorted) by the
merge key and every subsequent merge/join on that key reads
pre-partitioned buckets — the scan side needs NO exchange
(`tests/test_plans.py::test_bucketed_join_has_no_shuffle` proves it on
the physical plan).

This is the parquet/in-memory-catalog stand-in for what a Delta/Iceberg
deployment gets from clustered/partitioned layout; the write path is
identical code with a different `format`.
"""

from __future__ import annotations

import shutil
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist as a managed bucketed table, replacing any previous
    version. Bucket count is a layout contract: joins co-locate when
    both sides share it (or one side's count divides the other's)."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # the in-memory catalog forgets tables between sessions but their
    # warehouse directories persist; clear any stale location
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{warehouse}/{table.lower()}", ignore_errors=True)
    writer = df.write.bucketBy(buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.mode("overwrite").format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
