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
    The tail chunk may be shorter; every token is covered.

    One narrow explode per document: no shuffle, scales linearly.
    Chunk identity is the md5 of the joined token span, so downstream
    dedup needs no re-tokenization.
    """
    staged = df.select(
        F.col(id_col), tokens_col(F.col(text_col)).alias("_toks")
    )
    exploded = staged.select(
        id_col,
        "_toks",
        F.explode(
            F.sequence(F.lit(1), F.size("_toks"), F.lit(stride))
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
    itself through overlap. Two shuffles total: hash-group on
    chunk_hash, then group back on the document id.
    """
    chunks = token_chunks(
        df, chunk_size=chunk_size, stride=chunk_size,
        text_col=text_col, id_col=id_col,
    )
    by_hash = chunks.groupBy("chunk_hash").agg(
        F.count_distinct(F.col(id_col)).alias("_n_docs")
    )
    return (
        chunks.join(by_hash, "chunk_hash")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum((F.col("_n_docs") >= 2).cast("long")).alias("n_shared_chunks"),
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
    shared-content mass, never N².
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
    return (
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
