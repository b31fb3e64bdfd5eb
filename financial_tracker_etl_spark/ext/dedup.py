"""[EXT] Near-duplicate detection (SURVEY.md §2.K X1/X2).

Three tiers, trading exactness for scale:

- :func:`shingle_jaccard_pairs` — exact n-gram Jaccard via a
  shingle-inverted-index self-join. Exact but O(pairs sharing a
  shingle); the oracle-checkable baseline.
- :func:`minhash_near_dups` — MinHash + LSH banding: per-doc signature
  of K minima under independent hash functions (``xxhash64`` with seed
  salts), banded into B buckets; only same-bucket candidates get an
  exact Jaccard verification. This is the 100 TB path: cost is
  O(docs × K) + O(candidate pairs), never O(n²).
- :func:`simhash_fingerprints` — 64-bit SimHash via per-token hash bit
  votes; Hamming-ball lookup via 16-bit chunk banding.

All built-in expressions (higher-order array functions + xxhash64) —
no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .text import tokens_col


def shingles_col(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of normalized text. Empty array
    when the doc has fewer than n tokens."""
    toks = tokens_col(text)
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    gram = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(n)]
        ),
    )
    return F.when(F.size(toks) >= n, F.array_distinct(gram)).otherwise(
        F.array().cast("array<string>")
    )


def doc_shingles(df: DataFrame, n: int = 3, text_col: str = "text") -> DataFrame:
    """(doc_id, shingle) exploded inverted-index rows.

    Tokenization is staged into its own projection so the split/lower
    pass runs once per row — referencing ``shingles_col`` directly would
    inline the tokenizer n times per gram (CollapseProject keeps the
    stage split because the producer expression is non-cheap and
    multiply-referenced)."""
    toked = df.select("doc_id", tokens_col(F.col(text_col)).alias("_toks"))
    toks = F.col("_toks")
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    gram = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)]),
    )
    sh = F.when(F.size(toks) >= n, F.array_distinct(gram)).otherwise(
        F.array().cast("array<string>")
    )
    return toked.select("doc_id", F.explode(sh).alias("shingle"))


def shingle_jaccard_pairs(
    df: DataFrame, n: int = 3, text_col: str = "text"
) -> DataFrame:
    """Exact pairwise n-gram Jaccard for every pair sharing >=1 shingle.

    jaccard = |A∩B| / (|A|+|B|-|A∩B|) — an exact integer ratio, so the
    double result is bit-identical across engines.
    """
    sh = doc_shingles(df, n, text_col)
    counts = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2")
        )
        .agg(F.count(F.lit(1)).alias("common"))
    )
    ca = counts.alias("ca")
    cb = counts.alias("cb")
    return (
        common.join(ca, F.col("doc1") == F.col("ca.doc_id"))
        .join(cb, F.col("doc2") == F.col("cb.doc_id"))
        .select(
            "doc1",
            "doc2",
            "common",
            F.round(
                F.col("common")
                / (F.col("ca.n_shingles") + F.col("cb.n_shingles") - F.col("common")),
                6,
            ).alias("jaccard"),
        )
    )


def minhash_signatures(
    df: DataFrame, k: int = 32, n: int = 3, text_col: str = "text"
) -> DataFrame:
    """(doc_id, sig) MinHash signatures over n-gram shingles.

    Staged so each expensive step runs ONCE per row: shingle
    construction, then one string xxhash64 pass, then the k hash
    functions as cheap long re-hashes ``xxhash64(base, seed)`` (an
    independent family since xxhash64 mixes the seed). Inlining the
    shingle expression k times instead blows the generated method past
    JIT limits and drops whole rows to interpreted eval — measured
    ~100× slower at sf0.1.
    """
    hashed = doc_shingles(df, n, text_col).select(
        "doc_id", F.xxhash64("shingle").alias("_h")
    )
    mins = hashed.groupBy("doc_id").agg(
        *[
            F.min(F.xxhash64(F.col("_h"), F.lit(seed))).alias(f"_m{seed}")
            for seed in range(k)
        ]
    )
    return mins.select(
        "doc_id", F.array(*[f"_m{seed}" for seed in range(k)]).alias("sig")
    )


def minhash_near_dups(
    df: DataFrame,
    k: int = 32,
    bands: int = 8,
    n: int = 3,
    threshold: float = 0.4,
    text_col: str = "text",
) -> DataFrame:
    """MinHash+LSH candidate generation + exact Jaccard verification.

    With k=32, bands=8 (rows/band r=4) the LSH S-curve crosses ~50%
    capture around j≈(1/b)^(1/r)≈0.6. Candidates are pairs agreeing on
    at least one full band; each candidate is then verified with the
    exact shingle Jaccard and filtered at ``threshold``.
    """
    rows_per_band = k // bands
    sig = minhash_signatures(df, k, n, text_col)

    banded = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            ",",
                            *[
                                F.element_at("sig", b * rows_per_band + r + 1).cast(
                                    "string"
                                )
                                for r in range(rows_per_band)
                            ],
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")

    x = banded.alias("x")
    y = banded.alias("y")
    candidates = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc1"), F.col("y.doc_id").alias("doc2")
        )
        .distinct()
    )

    # exact verification restricted to LSH candidates only — the whole
    # point of LSH: never compute the full O(shared-shingle-pairs)
    # self-join. Cost is O(candidates × shingles-per-doc).
    sh = doc_shingles(df, n, text_col)
    counts = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        candidates.join(a, F.col("doc1") == F.col("a.doc_id"))
        .join(
            b,
            (F.col("doc2") == F.col("b.doc_id"))
            & (F.col("a.shingle") == F.col("b.shingle")),
        )
        .groupBy("doc1", "doc2")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    ca = counts.alias("ca")
    cb = counts.alias("cb")
    return (
        common.join(ca, F.col("doc1") == F.col("ca.doc_id"))
        .join(cb, F.col("doc2") == F.col("cb.doc_id"))
        .select(
            "doc1",
            "doc2",
            "common",
            F.round(
                F.col("common")
                / (F.col("ca.n_shingles") + F.col("cb.n_shingles") - F.col("common")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash_fingerprints(df: DataFrame, text_col: str = "text") -> DataFrame:
    """64-bit SimHash: per-token xxhash64, per-bit majority vote.

    fingerprint bit i = 1 iff sum over tokens of sign(bit i of
    hash(token)) > 0. Banded into 4×16-bit chunks for Hamming-distance
    blocking (two docs within Hamming distance 3 of each other must
    agree on at least one chunk).
    """
    toks = F.array_distinct(tokens_col(F.col(text_col)))
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    bit_votes = [
        F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(
                h.bitwiseAND(F.shiftleft(F.lit(1).cast("long"), i)) != 0, 1
            ).otherwise(-1),
        )
        for i in range(64)
    ]
    fp = None
    for i, vote in enumerate(bit_votes):
        bit = F.when(vote > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
            F.lit(0).cast("long")
        )
        fp = bit if fp is None else fp.bitwiseOR(bit)
    out = df.select("doc_id", fp.alias("simhash"))
    for c in range(4):
        out = out.withColumn(
            f"chunk{c}",
            F.shiftrightunsigned(F.col("simhash"), c * 16).bitwiseAND(F.lit(0xFFFF)),
        )
    return out
