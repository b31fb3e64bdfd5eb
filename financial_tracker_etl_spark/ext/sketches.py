"""[EXT] Distributed cardinality sketches: a relational HyperLogLog
(Flajolet et al. 2007) whose registers and estimate are bit-identical
across engines — unlike ``approx_count_distinct``/DuckDB ``approx_*``,
whose internal hash families differ and can never share an oracle.

Construction (m = 256 buckets):
- 60-bit hash = first 15 hex digits of md5(key) — the engine's standard
  cross-engine hash coin, so DuckDB reproduces every register.
- bucket = h mod 256; w = h div 256 (52 bits); rho(w) = number of
  leading zeros of w in 52-bit width + 1 = 53 - bitlength(w), computed
  via length(bin(w)) (both engines print minimal binary), rho = 53 for
  w = 0.
- register r_b = max rho per bucket: ONE shuffle of (group, bucket)
  pairs — at 100 TB the map-side partial max reduces each partition to
  ≤ m rows per group before the exchange, which is the entire point of
  sketching.
- The harmonic mean needs sum(2^-r_b). Floating addition is
  order-sensitive, so the sum is computed EXACTLY: 2^-r scaled by 2^60
  is the integer 2^(60-r), accumulated in DECIMAL(38,0) (Spark) /
  HUGEINT (DuckDB); empty buckets contribute 2^60 each. The only
  float ops are one int→double conversion (correctly rounded on both
  engines) and one literal-shaped division — deterministic.

The raw estimate carries HLL's documented small-range bias below
~2.5m; ``n_empty_buckets`` is emitted so a consumer can apply the
linear-counting correction (m * ln(m/V)) downstream — ln is kept out
of the engine output because libm transcendentals are not
cross-engine-reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

HLL_BUCKETS = 256
_POW2_60 = 1 << 60
# alpha_256 * m^2 * 2^60, assembled from the same literals in the same
# order as the SQL twin so both engines produce the identical double.
# Explicit DOUBLE casts: a bare 0.7213 parses as DECIMAL on BOTH
# engines, and their decimal-division scale rules differ.
_ALPHA_NUM_SQL = (
    "CAST(0.7213 AS DOUBLE) / (1 + CAST(1.079 AS DOUBLE) / 256)"
    " * 65536 * 1152921504606846976"
)


def hll_registers(
    df: DataFrame, key: Column, group_cols: list[str]
) -> DataFrame:
    """(group, bucket, register) rows — the mergeable sketch state.
    Registers are max-folds, so shards/retries/late partitions merge
    idempotently (the same property the streaming upsert state relies
    on)."""
    h = (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 15), 16, 10)
        .cast("long")
    )
    staged = df.select(*group_cols, h.alias("_h")).select(
        *group_cols,
        (F.col("_h") % HLL_BUCKETS).alias("bucket"),
        F.expr(f"_h div {HLL_BUCKETS}").alias("_w"),
    )
    rho = F.when(F.col("_w") == 0, F.lit(53)).otherwise(
        F.lit(53) - F.length(F.bin(F.col("_w")))
    )
    return (
        staged.withColumn("_rho", rho)
        .groupBy(*group_cols, "bucket")
        .agg(F.max("_rho").alias("register"))
    )


def hll_estimate(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Collapse registers to the raw HLL cardinality estimate per
    group. Exact integer harmonic-sum (see module docstring), then one
    deterministic division."""
    # F.shiftleft only accepts a literal bit count; the SQL form takes
    # an expression on both engines
    scaled = F.expr("shiftleft(CAST(1 AS BIGINT), 60 - register)")
    per_group = registers.groupBy(*group_cols).agg(
        F.sum(scaled.cast("decimal(38,0)")).alias("_present_sum"),
        F.count(F.lit(1)).alias("_n_buckets"),
    )
    empty = (F.lit(HLL_BUCKETS) - F.col("_n_buckets")).cast("decimal(38,0)")
    total = F.col("_present_sum") + empty * F.lit(_POW2_60).cast("decimal(38,0)")
    return per_group.select(
        *group_cols,
        (F.lit(HLL_BUCKETS) - F.col("_n_buckets"))
        .cast("long")
        .alias("n_empty_buckets"),
        F.round(
            F.expr(_ALPHA_NUM_SQL) / total.cast("double"), 2
        ).alias("hll_estimate"),
    )


# ---------------------------------------------------------------------------
# Bloom filter membership sketch
# ---------------------------------------------------------------------------

BLOOM_BITS = 4096
BLOOM_HASHES = 4


def bloom_position_array(
    key: Column, k: int = BLOOM_HASHES, m: int = BLOOM_BITS
) -> Column:
    """Array of the k Bloom bit positions for ``key`` (Bloom 1970).

    Position j = first-8-hex-digits of md5(key # j) mod m — the same
    md5 coin as the HLL sketch above, so DuckDB reproduces every bit.
    The filter itself is the DISTINCT set of positions per group: a
    ≤ m-row relation per group, mergeable by union (the same
    idempotent-merge property as HLL registers). At 100 TB the built
    filter is broadcast-sized (m bits/group) no matter how large the
    corpus that built it — membership probes never touch the corpus
    that was sketched, which is the entire point.
    """
    return F.array(
        *[
            F.conv(
                F.substring(F.md5(F.concat(key, F.lit(f"#{j}"))), 1, 8), 16, 10
            ).cast("long")
            % m
            for j in range(k)
        ]
    )


CMS_DEPTH = 4
CMS_WIDTH = 512


def cms_sketch(
    items: DataFrame,
    key_col: str = "token",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) as a relation:
    ``depth`` independent md5 hash lanes map every item occurrence to a
    (lane, bucket) cell; the sketch is the per-cell occurrence count.

    ONE shuffle of (lane, bucket) pairs with map-side partial counts —
    the reduced state is depth·width rows no matter the corpus size,
    which is the whole point: at 100 TB the sketch aggregates
    arbitrarily many partitions into a constant-size table that then
    BROADCASTS to estimate frequencies with no second pass over the
    data. Same md5 hash-coin family as the HLL/Bloom sketches, so the
    DuckDB oracle reproduces every cell exactly.
    """
    lanes = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("lane")
    cells = items.select(F.col(key_col).alias("k"), lanes).select(
        "lane",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws("#", F.col("lane").cast("string"), F.col("k"))), 1, 8
                ),
                16,
                10,
            ).cast("long")
            % width
        ).alias("bucket"),
    )
    return cells.groupBy("lane", "bucket").agg(
        F.count(F.lit(1)).alias("cell_count")
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str = "token",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-frequency estimates: est(k) = min over lanes of the cell k
    hashes into — an overestimate by construction (collisions only add),
    within eps·N with high probability. The sketch side is broadcast;
    probes never touch the raw corpus."""
    from pyspark.sql.functions import broadcast

    lanes = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("lane")
    probe_cells = probes.select(F.col(key_col).alias("k"), lanes).select(
        "k",
        "lane",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws("#", F.col("lane").cast("string"), F.col("k"))), 1, 8
                ),
                16,
                10,
            ).cast("long")
            % width
        ).alias("bucket"),
    )
    joined = probe_cells.join(broadcast(sketch), ["lane", "bucket"], "left")
    return joined.groupBy("k").agg(
        F.min(F.coalesce(F.col("cell_count"), F.lit(0))).alias("cms_est")
    )
