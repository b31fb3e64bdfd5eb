"""[EXT] Span-granularity corpus operators: fixed-size token chunking
(training-sequence prep), chunk-level cross-document dedup, and
winnowing-style fingerprint-overlap pair detection (the MOSS shape).

Everything is built-in expressions after one staged tokenize/normalize
projection — the explode outputs stay inside whole-stage codegen, so
there is no per-row interpreted higher-order pipeline in the hot path
(measured rule: k-pass per-row array expressions are CodegenFallback
and lose badly to explode + hash aggregation).

Scale shape: chunking is a narrow explode (no shuffle); chunk dedup is
one shuffle on the chunk content hash plus one on doc_id; overlap-pair
detection shuffles only the mod-p SAMPLED fingerprint set (1/p of all
windows) and joins candidates on equal hash values, never all pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from . import materialize_release
from .text import normalized_text, tokens_col

CHUNK_SIZE = 32
CHUNK_STRIDE = 24

OVERLAP_WINDOW = 16
OVERLAP_MOD_P = 8
OVERLAP_MIN_SHARED = 2


def token_chunks(
    df: DataFrame,
    chunk_size: int = CHUNK_SIZE,
    stride: int = CHUNK_STRIDE,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document's whitespace tokens into ``chunk_size``-token
    windows every ``stride`` tokens (overlapping when stride <
    chunk_size) — the sequence-preparation step before packing/training.
    The tail chunk may be shorter; every token is covered, and no chunk
    is ever fully contained in its predecessor: start generation stops
    once a chunk reaches the document end (upper bound
    ``n - (chunk_size - stride)``, clamped to [1, n]), so a doc whose
    length lands inside the final stride window does not emit a
    redundant zero-new-token tail.

    One narrow explode per document: no shuffle, scales linearly.
    Chunk identity is the md5 of the joined token span, so downstream
    dedup needs no re-tokenization.
    """
    staged = df.select(
        F.col(id_col), tokens_col(F.col(text_col)).alias("_toks")
    ).filter(F.col("_toks").isNotNull())
    # NULL text produces NO chunks: both engines previously emitted one
    # PHANTOM chunk row (start 1, null hash) for a null-text doc by two
    # different null-folding accidents (Spark's null sequence bound vs
    # DuckDB's null-ignoring greatest/least), and every null-text doc
    # shared the same null hash — so contentless docs counted as
    # cross-document duplicates of each other in chunk_shared_stats
    # (round-15 fuzzer, content nulls)
    n = F.size("_toks")
    last_start = F.least(
        n, F.greatest(F.lit(1), n - F.lit(chunk_size - stride))
    )
    exploded = staged.select(
        id_col,
        "_toks",
        F.explode(
            F.sequence(F.lit(1), last_start, F.lit(stride))
        ).alias("start_token"),
    )
    chunk = F.slice(F.col("_toks"), F.col("start_token"), chunk_size)
    return exploded.select(
        id_col,
        ((F.col("start_token") - 1) / stride).cast("int").alias("chunk_idx"),
        F.col("start_token"),
        F.size(chunk).alias("n_chunk_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_hash"),
    )


def chunk_shared_stats(
    df: DataFrame,
    chunk_size: int = CHUNK_SIZE,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Chunk-level cross-document dedup stats: for each document, how
    many of its DISJOINT ``chunk_size``-token chunks also appear (by
    content hash) in at least one other document, and that share in ppm
    — the paragraph-granularity complement of whole-document X1 dedup
    (duplicated spans inside otherwise-distinct documents).

    Disjoint windows (stride = chunk_size) so a doc never matches
    itself through overlap. Two shuffles total, each ONE pass: a
    whole-partition window over chunk_hash marks shared chunks
    in-place — a chunk is cross-document iff the min and max doc id in
    its hash group differ, exactly "appears in >= 2 distinct docs"
    (the earlier count_distinct groupBy + join-back computed the
    chunking explode twice and shuffled the corpus-sized chunk stream
    a second time) — then the per-doc aggregation.
    """
    from pyspark.sql import Window

    chunks = token_chunks(
        df, chunk_size=chunk_size, stride=chunk_size,
        text_col=text_col, id_col=id_col,
    )
    wh = Window.partitionBy("chunk_hash")
    shared = F.min(F.col(id_col)).over(wh) != F.max(F.col(id_col)).over(wh)
    return (
        chunks.withColumn("_shared", shared)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.col("_shared").cast("long")).alias("n_shared_chunks"),
        )
        .withColumn(
            "shared_ppm",
            F.expr("1000000 * n_shared_chunks div n_chunks"),
        )
    )


def winnow_overlap_pairs(
    df: DataFrame,
    window: int = OVERLAP_WINDOW,
    mod_p: int = OVERLAP_MOD_P,
    min_shared: int = OVERLAP_MIN_SHARED,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Document-pair overlap via sampled character-window fingerprints
    — the winnowing-family fingerprint match used for containment /
    near-copy detection (Schleimer et al. 2003's mod-p selection
    variant, the scheme behind MOSS). Unlike whole-doc MinHash, this
    catches a short document pasted INTO a longer one: containment is
    measured against the smaller fingerprint set, not the union.

    Per doc: hash every ``window``-char window of the normalized text
    (first 32 bits of md5 — the engine's cross-engine hash coin), keep
    hashes ≡ 0 mod ``mod_p`` (deterministic 1/p content-defined
    sample), dedup per doc. Pairs sharing ≥ ``min_shared`` sampled
    fingerprints are emitted with ``containment_ppm`` = shared /
    min(|fp_a|, |fp_b|) in ppm.

    Scale: the explode is width×chars but immediately filtered to 1/p
    before the only shuffle (distinct on (doc, hash)); the pair join is
    an equi-join on hash values — candidate pairs are bounded by
    shared-content mass, never N². The sampled fingerprint table is
    PERSISTED before fan-out (stage_on_key contract — output
    materialized, cache released before returning): it feeds three
    consumers (both self-join sides and the per-doc counts), and
    without the cache Spark re-executes the dominant-cost
    explode→md5→distinct subtree once per reference — measured 8
    redundant scans and a 32 s rung on the 4× replicated-input ladder,
    vs ~6 s cached.
    """
    staged = df.select(
        F.col(id_col), normalized_text(F.col(text_col)).alias("_norm")
    ).filter(F.length("_norm") >= window)
    grams = staged.select(
        id_col,
        F.explode(
            F.sequence(F.lit(1), F.length("_norm") - (window - 1))
        ).alias("_i"),
        F.col("_norm"),
    ).select(
        id_col,
        F.col("_norm").substr(F.col("_i"), F.lit(window)).alias("_gram"),
    )
    fps = (
        grams.select(
            id_col,
            F.conv(F.substring(F.md5("_gram"), 1, 8), 16, 10)
            .cast("long")
            .alias("fp"),
        )
        .filter(F.col("fp") % mod_p == 0)
        .distinct()
        .persist()
    )
    n_fp = fps.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_fp"))
    a, b = fps.alias("a"), fps.alias("b")
    shared = (
        a.join(b, F.col("a.fp") == F.col("b.fp"))
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )
    na = n_fp.select(
        F.col(id_col).alias("doc_a"), F.col("n_fp").alias("_nfa")
    )
    nb = n_fp.select(
        F.col(id_col).alias("doc_b"), F.col("n_fp").alias("_nfb")
    )
    out = (
        shared.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "shared_fps",
            F.expr("1000000 * shared_fps div least(_nfa, _nfb)").alias(
                "containment_ppm"
            ),
        )
    )
    return materialize_release(out, fps)


DUP_SPAN_N = 8


def duplicate_span_stats(docs: DataFrame, n: int = DUP_SPAN_N) -> DataFrame:
    """Repeated-substring detection, the Lee et al. "Deduplicating
    Training Data Makes Language Models Better" shape re-expressed
    relationally: every ``n``-token sliding gram is hashed; grams that
    occur more than once ANYWHERE in the corpus (same doc included)
    mark their ``n``-token span as duplicated; overlapping spans merge
    per document; the output is per-doc duplicated-span statistics —
    the mask a curation pass uses to cut repeated boilerplate out of
    training text (as opposed to dropping whole near-dup docs).

    The suffix-array machinery of the paper is a single-node design;
    the distributed equivalent of its "duplicated substring of length
    >= n" predicate is exactly this gram-hash → global count → interval
    merge pipeline:

    - sliding grams via ``lead`` windows (narrow, per-doc partitions);
    - ONE shuffle on the gram hash, where a whole-partition window
      count marks every gram occurring more than once — one pass over
      the gram stream (the earlier groupBy→filter→join-back formulation
      computed the explode subtree twice and, at scale, shuffled the
      corpus-sized gram stream a second time for the join; measured
      ~30% faster at sf0.1, values identical);
    - interval merge per doc via a running-max window (no UDF).

    Output: (doc_id, n_tokens, n_dup_spans, dup_tokens, dup_ppm) for
    every document, zeros where nothing repeats.
    """
    from pyspark.sql import Window

    # instance key: duplicate doc_ids whose copies carry DIFFERENT
    # texts (the round-16 dupes x unicode/extreme fuzz interaction)
    # would otherwise share one pos-window — tied positions with
    # divergent tokens make lead()'s gram stream engine-dependent.
    # Keying every window by (doc_id, md5(text)) gives each document
    # INSTANCE its own deterministic gram stream and span set; exact
    # copies share a stream (their grams count >1 globally, which is
    # the honest read of a literally-duplicated document).
    tkey = F.md5(F.coalesce(F.col("text"), F.lit("")))
    toks = docs.select(
        "doc_id",
        tkey.alias("_tkey"),
        F.posexplode(tokens_col(F.col("text"))).alias(
            "pos", "tok"
        ),
    )
    wdoc = Window.partitionBy("doc_id", "_tkey").orderBy("pos")
    gram = F.concat_ws(
        " ", F.col("tok"), *[F.lead("tok", i).over(wdoc) for i in range(1, n)]
    )
    # gram and the completeness marker MUST be computed in the same
    # projection: a window evaluated after the filter would see the
    # truncated row set and silently corrupt the tail grams of each doc
    grams = (
        toks.select(
            "doc_id",
            "_tkey",
            "pos",
            F.md5(gram).alias("ghash"),
            F.lead("tok", n - 1).over(wdoc).alias("_last"),
        )
        .filter(F.col("_last").isNotNull())
        .select("doc_id", "_tkey", "pos", "ghash")
    )
    wg = Window.partitionBy("ghash")
    dup_pos = (
        grams.withColumn("_n", F.count(F.lit(1)).over(wg))
        .filter(F.col("_n") > 1)
        .select("doc_id", "_tkey", "pos")
    )

    # classic interval merge: a span starts a new island iff its start
    # lies past the running max end of all earlier spans in the doc
    prev_end = F.max(F.col("pos") + (n - 1)).over(
        Window.partitionBy("doc_id", "_tkey")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    islanded = dup_pos.withColumn(
        "_island",
        F.sum(
            F.when(prev_end.isNull() | (F.col("pos") > prev_end), 1).otherwise(0)
        ).over(
            Window.partitionBy("doc_id", "_tkey")
            .orderBy("pos")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    spans = islanded.groupBy("doc_id", "_tkey", "_island").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + (n - 1)).alias("span_end"),
    )
    per_doc = spans.groupBy("doc_id", "_tkey").agg(
        F.count(F.lit(1)).alias("n_dup_spans"),
        F.sum(F.col("span_end") - F.col("span_start") + 1).alias("dup_tokens"),
    )
    totals = docs.select(
        "doc_id",
        tkey.alias("_tkey"),
        F.size(tokens_col(F.col("text"))).alias("n_tokens"),
    )
    return (
        totals.join(per_doc, ["doc_id", "_tkey"], "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_dup_spans", F.lit(0)).alias("n_dup_spans"),
            F.coalesce("dup_tokens", F.lit(0)).alias("dup_tokens"),
            F.floor(
                F.lit(1_000_000)
                * F.coalesce("dup_tokens", F.lit(0))
                / F.col("n_tokens")
            ).cast("long").alias("dup_ppm"),
        )
    )
