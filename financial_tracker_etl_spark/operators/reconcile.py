"""Bucket-digest table reconciliation (anti-entropy at scale).

Comparing two 100 TB snapshots row-by-row is a full shuffle join of
both tables; the operational shape (Merkle-style anti-entropy, as in
Dynamo/Cassandra repair) is: hash every row's KEY into a small bucket
space, reduce each bucket to (row count, order-independent digest sum),
and full-outer-join the two tiny digest tables — mismatched buckets
localize the diff, and only THOSE buckets ever need the row-level join.

Cross-engine determinism: the per-row digest is the engine's md5
hash-coin (60-bit int) reduced mod 2^31-1, and the bucket digest is the
SUM widened to DECIMAL(38,0) then reduced mod 2^31-1 again — modular
addition is still order-independent, so the digest stays
partition-layout-proof while the widened accumulator removes the old
~4e9-rows-per-bucket int64 bound (a 100 TB snapshot over 64 buckets
exceeds it). Floats in the digested payload are scaled to
integers first — float→string rendering is NOT cross-engine-stable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

DIGEST_MOD = 2_147_483_647  # 2^31 - 1


def _md5_int60(c: Column) -> Column:
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def bucket_digests(
    df: DataFrame,
    key_cols: list[str],
    payload: Column,
    n_buckets: int = 64,
) -> DataFrame:
    """(bucket, n_rows, digest_sum): one row per key-hash bucket.
    ``payload`` is a string column rendering the fields under
    comparison (caller scales floats to integers)."""
    key_str = F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])
    bucket = (_md5_int60(key_str) % n_buckets).alias("bucket")
    row_digest = _md5_int60(F.concat_ws("|", key_str, payload)) % DIGEST_MOD
    return (
        df.select(bucket, row_digest.alias("_d"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            # the cast sits INSIDE the sum: an int64 sum overflows
            # before an outer cast could run (throws under ANSI, the
            # session default; wraps without), while DuckDB's sum
            # promotes to HUGEINT on its own
            F.expr(
                f"CAST(sum(CAST(_d AS DECIMAL(38,0))) % {DIGEST_MOD}"
                " AS BIGINT)"
            ).alias("digest_sum"),
        )
    )


def digest_diff(a: DataFrame, b: DataFrame) -> DataFrame:
    """Buckets where the two snapshots disagree (count or digest),
    with both sides' stats — the bucket list a repair pass would then
    join row-level. Output: (bucket, n_old, n_new, digest_match)."""
    a2 = a.select(
        "bucket",
        F.col("n_rows").alias("n_old"),
        F.col("digest_sum").alias("_da"),
    )
    b2 = b.select(
        "bucket",
        F.col("n_rows").alias("n_new"),
        F.col("digest_sum").alias("_db"),
    )
    j = a2.join(b2, "bucket", "full_outer")
    return (
        j.select(
            "bucket",
            F.coalesce("n_old", F.lit(0)).alias("n_old"),
            F.coalesce("n_new", F.lit(0)).alias("n_new"),
            (
                F.coalesce("_da", F.lit(-1)) == F.coalesce("_db", F.lit(-2))
            ).alias("digest_match"),
        )
        .filter(
            (F.col("n_old") != F.col("n_new")) | (~F.col("digest_match"))
        )
    )
