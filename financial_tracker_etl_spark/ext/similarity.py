"""[EXT] Similarity search over the ``embeddings`` table
(SURVEY.md §2.K X2/X4).

Two paths:

- :func:`topk_cosine_bruteforce` — exact top-k for a small query set
  against the full corpus. The dot product is a sequential left fold
  (``F.aggregate`` over ``F.zip_with``) in DOUBLE, matching DuckDB's
  ``list_dot_product`` bit-for-bit. The query side is broadcast; the
  corpus side streams — at 100 TB this is one scan, no shuffle of the
  corpus.
- :func:`topk_cosine_lsh` — sign-random-projection LSH: deterministic
  pseudo-random hyperplanes (xxhash64-seeded), bucket on the sign
  pattern, exact re-rank within matching buckets (multi-probe via
  band splitting). The scale path: candidates per query drop from N
  to N/2^planes on average.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.functions import broadcast


def as_double_vec(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def _corpus(df: DataFrame) -> DataFrame:
    v = as_double_vec(F.col("embedding"))
    return df.select("vec_id", v.alias("v"), norm(v).alias("nrm"))


def topk_cosine_bruteforce(
    embeddings: DataFrame, query_mod: int = 97, k: int = 10
) -> DataFrame:
    """Exact top-k cosine neighbors for query vectors
    (vec_id % query_mod == 0) against the whole corpus, self excluded.
    Deterministic rank tie-break on neighbor id."""
    from pyspark.sql import Window

    corpus = _corpus(embeddings)
    queries = corpus.filter((F.col("vec_id") % query_mod) == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    scored = (
        corpus.join(broadcast(queries), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cosine", 6).alias("cosine"))
    )


def ivf_assignments(
    corpus: DataFrame, centroids: DataFrame
) -> DataFrame:
    """Assign every corpus vector to its nearest centroid (the IVF
    inverted-file build). One broadcast nested-loop over the tiny
    centroid table + a max_by aggregation — the corpus never shuffles;
    at 100 TB the output would be written bucketed by ``cluster_id`` so
    probes read only matching buckets."""
    scored = corpus.join(broadcast(centroids)).select(
        "vec_id",
        "v",
        "nrm",
        F.col("centroid_id"),
        (dot(F.col("v"), F.col("cv")) / (F.col("nrm") * F.col("cn"))).alias(
            "ccos"
        ),
    )
    # max_by over a (score, -id) struct = deterministic nearest centroid
    return scored.groupBy("vec_id").agg(
        F.max_by(
            "centroid_id", F.struct(F.col("ccos"), -F.col("centroid_id"))
        ).alias("cluster_id"),
        F.first("v").alias("v"),
        F.first("nrm").alias("nrm"),
    )


def topk_cosine_ivf(
    embeddings: DataFrame,
    query_mod: int = 97,
    k: int = 10,
    centroid_mod: int = 23,
    nprobe: int = 4,
) -> DataFrame:
    """Approximate top-k via an IVF index: deterministic centroid
    sample (vec_id % centroid_mod == 1 — a k-means fit would slot in
    here unchanged), corpus bucketed by nearest centroid, queries probe
    their ``nprobe`` nearest clusters only. Candidate count drops to
    ~nprobe/C of the corpus; recall is tested against the exact
    brute-force in tests/test_ext.py."""
    from pyspark.sql import Window

    corpus = _corpus(embeddings)
    centroids = corpus.filter((F.col("vec_id") % centroid_mod) == 1).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cn"),
    )
    assigned = ivf_assignments(corpus, centroids)

    queries = corpus.filter((F.col("vec_id") % query_mod) == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    qscore = queries.join(broadcast(centroids)).select(
        "query_id",
        "qv",
        "qn",
        "centroid_id",
        (dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias(
            "ccos"
        ),
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("ccos").desc(), F.col("centroid_id").asc()
    )
    probes = (
        qscore.withColumn("_pr", F.row_number().over(wq))
        .filter(F.col("_pr") <= nprobe)
        .select("query_id", "qv", "qn", F.col("centroid_id").alias("cluster_id"))
    )

    cand = assigned.alias("c").join(
        broadcast(probes).alias("p"),
        (F.col("c.cluster_id") == F.col("p.cluster_id"))
        & (F.col("c.vec_id") != F.col("p.query_id")),
    )
    scored = cand.select(
        "query_id",
        F.col("c.vec_id").alias("neighbor_id"),
        (dot(F.col("p.qv"), F.col("c.v")) / (F.col("p.qn") * F.col("c.nrm"))).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cosine", 6).alias("cosine"))
    )


def cosine_near_dup_pairs(
    embeddings: DataFrame, threshold: float = 0.9
) -> DataFrame:
    """X2 embedding-cosine near-duplicate pairs (a < b, cosine >=
    threshold). Exact all-pairs — the oracle-checkable baseline; the
    scale path bolts the sign-LSH bucketing of :func:`topk_cosine_lsh`
    in front as a prefilter so candidates drop from N²/2 to same-bucket
    pairs. Shuffle-free here: the smaller side broadcasts."""
    corpus = _corpus(embeddings)
    a = corpus.alias("a")
    b = corpus.alias("b")
    return (
        a.join(broadcast(b), F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec1"),
            F.col("b.vec_id").alias("vec2"),
            (
                dot(F.col("a.v"), F.col("b.v"))
                / (F.col("a.nrm") * F.col("b.nrm"))
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
        .select("vec1", "vec2", F.round("cosine", 6).alias("cosine"))
    )


def _hyperplane_sign(v: Column, plane: int, dim: int) -> Column:
    """Deterministic pseudo-random hyperplane: component i weight =
    xxhash64(i, plane) mapped to ±[0,1). Sign of the projection."""
    proj = F.aggregate(
        F.zip_with(
            v,
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda x, i: x
            * ((F.xxhash64(i, F.lit(plane)) % 1000).cast("double") / 1000.0),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return F.when(proj >= 0, 1).otherwise(0)


def topk_cosine_lsh(
    embeddings: DataFrame,
    query_mod: int = 97,
    k: int = 10,
    planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: sign-LSH bucket join, exact cosine re-rank
    within candidates. Multi-probe: two 4-plane half-buckets, a
    candidate matches if either half matches (recall boost at the cost
    of ~2× candidates)."""
    from pyspark.sql import Window

    corpus = _corpus(embeddings)
    signs = [
        _hyperplane_sign(F.col("v"), p, dim).cast("string") for p in range(planes)
    ]
    half = planes // 2
    bucketed = corpus.select(
        "vec_id",
        "v",
        "nrm",
        F.concat(*signs[:half]).alias("b0"),
        F.concat(*signs[half:]).alias("b1"),
    )
    queries = bucketed.filter((F.col("vec_id") % query_mod) == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
        F.col("b0").alias("qb0"),
        F.col("b1").alias("qb1"),
    )
    cand = bucketed.join(
        broadcast(queries),
        (F.col("vec_id") != F.col("query_id"))
        & ((F.col("b0") == F.col("qb0")) | (F.col("b1") == F.col("qb1"))),
    )
    scored = cand.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cosine", 6).alias("cosine"))
    )
