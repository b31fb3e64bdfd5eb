"""[EXT] Corpus assembly operators for LLM training-data pipelines:
deterministic sampling / data mixing, sequence packing, vocabulary
statistics, and leakage-safe dataset splits.

All selection decisions are HASH-based (md5 of a stable id), never
RNG-based: a 100 TB pipeline re-run, a late-arriving partition, or a
speculative task must make the identical keep/drop decision, and the
DuckDB differential oracle must be able to reproduce it verbatim.
Everything here is built-in expressions — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from . import materialize_release


def pct_hash(col: Column, mod: int = 10_000) -> Column:
    """Uniform [0, mod) bucket from the first 32 bits of md5(col) —
    the deterministic coin every sampling decision flips. Exact DuckDB
    twin: ``CAST('0x' || substr(md5(CAST(x AS VARCHAR)), 1, 8) AS
    BIGINT) % mod``."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10)
        .cast("long")
        % mod
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum Bernoulli sampling at fixed rates — the data-mixing
    primitive (e.g. upsample low-resource languages, downsample boiler-
    plate). Pure narrow filter: no shuffle, trivially scales; the kept
    set is a deterministic function of (id, stratum table).
    """
    coin = pct_hash(F.col(id_col))
    rate = F.lit(default_rate)
    for stratum, r in rates.items():
        rate = F.when(F.col(strata_col) == stratum, F.lit(r)).otherwise(rate)
    # the applied ``_keep_rate`` stays in the output on purpose (same
    # contract as mix_by_token_budget): downstream consumers report it
    # (e.g. the stratified-sample registry query emits it as keep_rate)
    return df.withColumn("_keep_rate", rate).filter(
        coin < F.col("_keep_rate") * 10_000
    )


def mix_by_token_budget(
    docs: DataFrame,
    weights: dict[str, float],
    n_tokens_col: str,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Token-budget data mixing: downsample each source so the KEPT
    token mass follows the target ``weights`` distribution, scaled to
    the largest budget feasible without upsampling (water-filled to the
    limiting source: B = min_s tokens_s / w_s, rate_s = w_s * B /
    tokens_s — the rate of the scarcest weighted source is exactly 1).
    This is the mixture-assembly step of a pre-training corpus build
    (e.g. The Pile / MassiveText mixture tables) as one deterministic
    dataflow.

    Scale shape: one vocabulary-of-sources-sized aggregation, a
    broadcast of the per-source rate table, then the same narrow
    hash-coin filter as :func:`stratified_sample` — the corpus-sized
    side is never shuffled. Sources without a weight — and weighted
    sources whose docs carry zero token mass, which could not anchor a
    water-fill — are dropped (rate 0). Returns the kept docs with
    their ``_keep_rate``.
    """
    toks = F.col(n_tokens_col).cast("double")
    weight = F.lit(None).cast("double")
    for src, wt in sorted(weights.items()):
        weight = F.when(F.col(source_col) == src, F.lit(float(wt))).otherwise(weight)
    # a weighted source with zero kept token mass is excluded like an
    # absent one: keeping it would anchor the water-fill budget at 0
    # and silently collapse EVERY source's rate (its own docs carry no
    # tokens either way)
    totals = (
        docs.withColumn("_w", weight)
        .filter(F.col("_w") > 0)
        .groupBy(source_col, "_w")
        .agg(F.sum(toks).alias("_src_tokens"))
        .filter(F.col("_src_tokens") > 0)
    )
    budget = totals.agg(
        F.min(F.col("_src_tokens") / F.col("_w")).alias("_budget")
    )
    rates = totals.crossJoin(F.broadcast(budget)).select(
        source_col,
        (F.col("_w") * F.col("_budget") / F.col("_src_tokens")).alias("_keep_rate"),
    )
    coin = pct_hash(F.col(id_col))
    return docs.join(F.broadcast(rates), source_col).filter(
        coin < F.col("_keep_rate") * 10_000
    )


def pack_sequences(
    df: DataFrame,
    n_tokens_col: str,
    max_tokens: int = 512,
    shards: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Concat-and-chunk sequence packing plan: documents are laid out
    end-to-end in deterministic (shard, id) order and cut into
    ``max_tokens`` windows; each doc gets its shard, sequence ordinal
    and start offset within the stream.

    Scale shape: ONE hash shuffle on the shard key, then a per-shard
    ordered running sum — shard count is the parallelism knob, and no
    shard ever needs more than its own token stream in memory. A global
    (unsharded) packing would be a single-partition sort: exactly the
    anti-pattern the plan guard bans.
    """
    shard = pct_hash(F.col(id_col), shards).alias("shard")
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = F.col(n_tokens_col)
    with_shard = df.select(id_col, n_tokens_col, shard)
    return with_shard.select(
        id_col,
        n_tokens_col,
        "shard",
        (F.sum(toks).over(w) - toks).alias("stream_offset"),
    ).select(
        id_col,
        n_tokens_col,
        "shard",
        F.floor(F.col("stream_offset") / max_tokens)
        .cast("long")
        .alias("seq_id"),
        (F.col("stream_offset") % max_tokens).alias("seq_offset"),
    )


def vocab_top_terms(
    df: DataFrame, tokens: Column, k: int = 100
) -> DataFrame:
    """Corpus-wide top-k token frequencies (vocabulary head). Explode →
    partial-aggregated count (map-side combine carries the heavy lift)
    → distributed top-k via orderBy+limit (TakeOrderedAndProject, never
    a global window over the full vocabulary)."""
    counts = (
        df.select(F.explode(tokens).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    order = [F.col("n_occurrences").desc(), F.col("token").asc()]
    top = counts.orderBy(*order).limit(k)
    return top.withColumn("rank", F.row_number().over(Window.orderBy(*order)))


def leakage_safe_splits(
    docs: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    val_pct: int = 5,
    test_pct: int = 5,
) -> DataFrame:
    """train/val/test assignment that can NOT leak near-duplicates
    across splits: the hash coin is flipped per dedup CLUSTER, not per
    document, so every member of a near-dup cluster lands in the same
    split (the train/test-contamination guard every serious corpus
    build needs). Docs outside any cluster are their own singleton
    cluster. ``clusters`` is (doc_id, cluster_id), e.g. from
    ext.cluster.connected_components over near-dup edges."""
    joined = docs.select(id_col).join(
        clusters.withColumnRenamed("doc_id", id_col), id_col, "left"
    )
    cid = F.coalesce(F.col("cluster_id"), F.col(id_col)).alias("cluster_id")
    coin = pct_hash(F.coalesce(F.col("cluster_id"), F.col(id_col)), 100)
    split = (
        F.when(coin < F.lit(val_pct), "val")
        .when(coin < F.lit(val_pct + test_pct), "test")
        .otherwise("train")
    )
    return joined.select(id_col, cid, split.alias("split"))


DSIR_BUCKETS = 128


def dsir_importance(
    docs: DataFrame,
    is_target: Column,
    tokens: Column,
    id_col: str = "doc_id",
    buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al. 2023),
    integer-exact variant: score every document by how target-like its
    hashed-token profile is, so a raw 100 TB crawl can be resampled
    toward a small high-quality target domain.

    Token occurrences hash into ``buckets`` feature buckets (md5 coin —
    deterministic, DuckDB-reproducible). Each bucket's affinity is the
    ppm share of its occurrences that come from target-domain rows
    (``is_target``); a document's ``importance_ppm`` is the mean bucket
    affinity over its token occurrences (BIGINT div — no floats, no
    transcendentals, hash-exact across engines; the published method's
    log-ratio ranking is monotone in this mean for a fixed corpus).

    Scale: one explode + one groupBy over ``buckets`` rows, then the
    per-doc aggregate joins the bucket table via BROADCAST (``buckets``
    rows, never a shuffle of the corpus side). The exploded occurrence
    stream is persisted: it feeds BOTH the bucket-stats build and the
    scoring probe, and without the cache the corpus-wide
    tokenize+explode — the operator's dominant cost — would execute
    twice (the broadcast build side cannot reuse the probe side's
    exchange). Same cache contract as pagerank/bfs_hops/
    connected_components (stage_on_key): the output is materialized
    (persist + count — lineage kept, see ext.materialize_release) and
    the occurrence cache released before returning, so the
    dominant-cost intermediate never outlives the operator.
    """
    occ = (
        docs.select(
            F.col(id_col),
            is_target.cast("long").alias("_tgt"),
            F.explode(tokens).alias("_token"),
        )
        .withColumn("bucket", pct_hash(F.col("_token"), buckets))
        .persist()
    )
    bucket_stats = occ.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("_total"),
        F.sum("_tgt").alias("_target"),
    ).withColumn("affinity_ppm", F.expr("1000000 * _target div _total"))
    scored = (
        occ.join(F.broadcast(bucket_stats.select("bucket", "affinity_ppm")), "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("affinity_ppm").alias("_aff_sum"),
        )
        .withColumn("importance_ppm", F.expr("_aff_sum div n_tokens"))
        .drop("_aff_sum")
    )
    return materialize_release(scored, occ)


def shard_assignments(
    docs: DataFrame, n_shards: int = 16, token_col: str = "n_chars"
) -> DataFrame:
    """Deterministic output sharding for training-data writes:
    (doc_id, shard_id, shard_pos, weight) where shard_id is an md5
    hash-coin bucket and shard_pos the document's rank inside its
    shard in (hash, doc_id) order — i.e. the file and offset a
    tokenize-and-write job would place this document at, decided
    entirely by data, not by partition layout or arrival order.

    Scale shape: this IS the plan for the terminal write of a corpus
    pipeline — ``df.repartition(n_shards, shard_id)`` then
    ``sortWithinPartitions(shard_pos)`` streams each shard out in one
    pass (one shuffle total); the hash coin balances shards to within
    sampling noise regardless of doc_id clustering, and a re-run (or a
    task retry) reproduces byte-identical shards, which is what makes
    checkpoint-resume of a 100 TB tokenization job safe.
    """
    h = pct_hash(F.col("doc_id"), mod=1_000_000_007)
    w = Window.partitionBy("shard_id").orderBy("h", "doc_id")
    return (
        docs.select(
            "doc_id", F.col(token_col).alias("weight"), h.alias("h")
        )
        .withColumn("shard_id", (F.col("h") % n_shards).cast("int"))
        .withColumn("shard_pos", F.row_number().over(w))
        .select("doc_id", "shard_id", "shard_pos", "weight")
    )


def pps_systematic_sample(
    docs: DataFrame,
    n_select: int = 100,
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
    block: int = 64,
) -> DataFrame:
    """Systematic probability-proportional-to-size sampling: documents
    in ``id_col`` order carry an exact global running weight; a doc is
    selected iff its weight interval [cum_w - weight, cum_w) spans a
    multiple of step = total_weight // n_select. Inclusion probability
    ~ weight/step, integer-exact end to end — deliberately NOT the
    Efraimidis-Spirakis -ln(u)/w key, whose libm transcendental is not
    cross-engine-reproducible.

    The global prefix sum is the scalable two-pass shape (same family
    as pack_sequences): contiguous id blocks get per-block running sums
    (partitioned window, parallel), block totals aggregate to a tiny
    table whose own prefix (the block offset) comes from a broadcast
    non-equi self-join — the only non-equi join is over #blocks rows,
    never over documents.
    """
    from pyspark.sql.types import NumericType

    if not isinstance(docs.schema[id_col].dataType, NumericType):
        raise TypeError(
            f"pps_systematic_sample needs a numeric {id_col!r} for its "
            "contiguous block key: a non-numeric id would cast to NULL, "
            "collapsing every row into one block and the parallel "
            "per-block prefix sum into a single-partition window"
        )
    shard = F.floor(F.col(id_col) / block).alias("blk")
    w = (
        Window.partitionBy("blk")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_in = docs.select(
        id_col, F.col(weight_col).alias("weight"), shard
    ).withColumn("cum_in", F.sum("weight").over(w))
    totals = cum_in.groupBy("blk").agg(F.sum("weight").alias("blk_total"))
    offsets = (
        totals.alias("a")
        .join(
            F.broadcast(totals.alias("b")),
            F.col("b.blk") < F.col("a.blk"),
            "left",
        )
        .groupBy(F.col("a.blk").alias("blk"))
        .agg(F.coalesce(F.sum("b.blk_total"), F.lit(0)).alias("offset"))
    )
    total = totals.agg(F.sum("blk_total").alias("total"))
    cum = (
        cum_in.join(F.broadcast(offsets), "blk")
        .withColumn("cum_w", F.col("offset") + F.col("cum_in"))
        .join(F.broadcast(total))
        # step clamps to >= 1: total_weight < n_select would truncate
        # to 0 and the selection division would throw (ANSI) or null
        # out every row; with step 1 every positive-weight row selects,
        # the sensible degenerate of "asked for more than exists".
        # Integral `div` here for the same reason as the selection
        # below: total shares cum_w's magnitude, so a double divide
        # could disagree with the oracle's integer `//` past 2^53.
        .withColumn(
            "step",
            F.greatest(
                F.lit(1).cast("long"),
                F.expr(f"total div {int(n_select)}"),
            ),
        )
    )
    # integer `div`, not float floor-division: cum_w can pass 2^53 at
    # corpus scale, where double division would quietly lose the
    # low-order units the selection boundary lives in
    return cum.filter(
        F.expr("(cum_w div step) > ((cum_w - weight) div step)")
    ).select(id_col, "weight", F.col("cum_w").cast("long").alias("cum_w"))


def per_stratum_top_n(
    docs: DataFrame,
    stratum_col: str = "lang",
    n: int = 50,
    id_col: str = "doc_id",
) -> DataFrame:
    """Fixed-N uniform sample per stratum ("take 50 docs per
    language"): rank by the md5 hash coin inside each stratum and keep
    the first ``n`` — deterministic, order-independent, and exactly N
    per stratum (or all rows for strata smaller than N), which
    rate-based sampling cannot promise.

    Scale shape: one shuffle on the stratum key and a per-stratum
    WindowGroupLimit (top-n pushdown) — Spark stops tracking a
    partition's rows past rank N instead of sorting whole strata."""
    h = pct_hash(F.col(id_col), mod=1_000_000_007)
    w = Window.partitionBy(stratum_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        docs.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n)
        .select(id_col, stratum_col, F.col("_rk").alias("sample_rank"))
    )
