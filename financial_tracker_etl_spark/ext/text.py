"""[EXT] Text-analysis operators over the ``documents`` table
(SURVEY.md §2.K X3; mandated by BASELINE.json north_star).

All hot-path logic is built-in column expressions (JVM-side,
whole-stage codegen) — token counting, quality scoring, language ID,
and fingerprinting run at 100 TB without a single Python UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# tiny per-language stopword sets for the n-gram/stopword heuristic
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist"),
    "en": ("the", "a", "and", "of", "to"),
    "es": ("el", "la", "de", "y", "que"),
    "fr": ("le", "les", "et", "des", "un"),
}


def tokens_col(text: Column) -> Column:
    """Whitespace tokenization of normalized text."""
    return F.split(F.lower(F.trim(text)), " ")


def normalized_text(text: Column) -> Column:
    return F.lower(F.regexp_replace(F.trim(text), r"\s+", " "))


def _hits(tokens: Column, words: tuple[str, ...]) -> Column:
    return F.size(F.filter(tokens, lambda t: t.isin(*words)))


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting + basic shape stats (X3: token counting)."""
    toks = tokens_col(F.col(text_col))
    n = F.size(toks)
    return df.withColumns(
        {
            "n_tokens": n,
            "n_unique_tokens": F.size(F.array_distinct(toks)),
            "n_chars_norm": F.length(normalized_text(F.col(text_col))),
            "avg_token_len": F.round(
                (F.length(F.replace(F.trim(F.col(text_col)), F.lit(" "), F.lit("")))
                 ).cast("double") / n, 6
            ),
        }
    )


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality score: length band + stopword ratio + lexical
    diversity. The exact formula is synthetic; what matters is that it
    is deterministic, per-row, and expressed in built-ins."""
    toks = tokens_col(F.col(text_col))
    n = F.size(toks).cast("double")
    stop_ratio = _hits(toks, LANG_STOPWORDS["en"]).cast("double") / n
    diversity = F.size(F.array_distinct(toks)).cast("double") / n
    length_band = F.when((n >= 20) & (n <= 200), F.lit(1.0)).otherwise(F.lit(0.5))
    return df.withColumns(
        {
            "stopword_ratio": F.round(stop_ratio, 6),
            "lexical_diversity": F.round(diversity, 6),
            "quality_score": F.round(
                length_band * (1.0 - stop_ratio) * diversity, 6
            ),
        }
    )


def with_language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-vote language ID with deterministic alphabetical
    tie-break (X3: language identification)."""
    toks = tokens_col(F.col(text_col))
    de, en, es, fr = (
        _hits(toks, LANG_STOPWORDS[lang]) for lang in ("de", "en", "es", "fr")
    )
    lang = (
        F.when((de >= en) & (de >= es) & (de >= fr), "de")
        .when((en >= es) & (en >= fr), "en")
        .when(es >= fr, "es")
        .otherwise("fr")
    )
    return df.withColumn("lang_pred", lang)


# BPE-style pre-tokenizer classes: letter runs, digit runs, single
# punctuation marks (the GPT-2/tiktoken pre-split shape, minus unicode
# categories the synthetic corpus doesn't contain)
BPE_PRETOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def with_regex_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """X3 token counting under a BPE-ish regex pre-tokenizer — the
    count an LLM-data pipeline budgets with, vs the whitespace count of
    :func:`with_token_stats`. Pure JVM regex, no UDF."""
    toks = F.regexp_extract_all(F.col(text_col), F.lit(BPE_PRETOKEN_RE), F.lit(0))
    return df.withColumns(
        {
            "n_bpe_tokens": F.size(toks),
            "n_unique_bpe_tokens": F.size(F.array_distinct(toks)),
        }
    )


WINNOW_WINDOW = 16
_WINNOW_MOD = 2_147_483_647


def with_winnow_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """X3 fingerprinting via rolling hash: minimum 31-polynomial hash
    over all ``WINNOW_WINDOW``-char windows of the normalized text (the
    selection step of winnowing, Schleimer et al. 2003, arity 1) —
    robust to prefix/suffix edits where the md5 whole-doc fingerprint
    is not. Integer math mod 2^31-1 throughout, so Spark and DuckDB
    agree exactly. Docs shorter than the window get NULL."""
    k = WINNOW_WINDOW
    chars = F.transform(
        F.split(normalized_text(F.col(text_col)), ""),
        lambda c: F.ascii(c).cast("long"),
    )
    staged = df.withColumn("_chars", chars)
    ref = F.col("_chars")
    starts = F.sequence(F.lit(1), F.size(ref) - (k - 1))
    window_hash = lambda i: F.aggregate(  # noqa: E731
        F.sequence(i, i + (k - 1)),
        F.lit(0).cast("long"),
        lambda acc, j: (acc * 31 + F.element_at(ref, j.cast("int"))) % _WINNOW_MOD,
    )
    fp = F.when(
        F.size(ref) >= k, F.array_min(F.transform(starts, window_hash))
    ).otherwise(F.lit(None).cast("long"))
    return staged.withColumn("winnow_fp", fp).drop("_chars")


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 of whitespace-normalized lowercase
    text (X3: fingerprinting). Stable content address for exact dedup."""
    return df.withColumn("fingerprint", F.md5(normalized_text(F.col(text_col))))


def exact_dedup(
    df: DataFrame,
    key: Column,
    id_col: str = "doc_id",
    tiebreak: list | None = None,
) -> DataFrame:
    """X1 exact dedup: keep the lowest id per key — deterministic,
    unlike ``dropDuplicates`` whose survivor depends on partition
    order. One shuffle on the dedup key.

    ``tiebreak``: extra ordering columns appended after the id for
    callers whose OUTPUT observes payload columns that can differ
    between same-id rows (e.g. a corpus where a doc_id was ingested
    twice with differing source metadata — the round-15 fuzzer's
    null-perturbed duplicates). Ordering by the id alone leaves the
    survivor's payload engine-dependent in that case; pass explicit
    nulls-positioned columns (e.g. ``F.col("source").asc_nulls_last()``
    to match SQL ``NULLS LAST``) to total-order exactly what the
    output exposes."""
    from pyspark.sql import Window

    w = Window.partitionBy("dedup_key").orderBy(
        F.col(id_col).asc(), *(tiebreak or [])
    )
    return (
        df.withColumn("dedup_key", key)
        .withColumn("_rn", F.row_number().over(w))
        .withColumn(
            "n_duplicates", F.count(F.lit(1)).over(Window.partitionBy("dedup_key"))
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
