"""Adversarial-skew probe for the doc_lm_perplexity w1 window (round-7
judge task 3 / round-9 task 4).

The round-6 high-cardinality rule attaches LM statistics with
whole-partition windows (see queries/ext.py:_q_doc_lm_perplexity).
Windows are NOT splittable by AQE skew handling, so a single head token
carrying a large share of bigram mass concentrates that share of the
stream in ONE task. The round-7 16x/32x ladder on the real corpus
showed no inflection (natural token mass is spread); this probe builds
the ADVERSARIAL corpus instead: a synthetic token stream where one hub
token starts ~40% of all bigrams, at 8x the sf0.1 bigram volume.

Variants (identical output contract, same final per-doc aggregate):
  A window  — the shipped formulation: pair_count and w1_count attach
              via whole-partition windows over (w1,w2) and (w1).
  B salted  — pair_count window unchanged (pair keys are not skewed by
              construction of a hub FIRST token); w1_count computed by
              salting w1 into SALT sub-partitions, a (w1,salt) window
              for partials, then distinct partials -> groupBy(w1) sum
              -> join back on w1. The join (unlike the window) is
              AQE-skew-splittable.

Draw protocol (BASELINE.md bench-variance note): interleaved A,B pairs,
first pair discarded (JIT warm-up), report per-variant medians of the
remaining draws. Compare ratios within this run only.

Usage: python scripts/skew_probe_r9.py [n_docs] [hub_pct]
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import Window, functions as F

sys.path.insert(0, "/root/repo")
from financial_tracker_etl_spark.session import get_spark  # noqa: E402

TOKENS_PER_DOC = 51  # 50 bigrams/doc
VOCAB = 20_000
SALT = 16


def synthetic_pairs(spark, n_docs: int, hub_pct: int):
    """(doc_id, w1, w2) bigram stream where ~hub_pct% of positions are
    the single token 'hub' (so ~hub_pct% of bigrams have w1='hub').
    Deterministic Knuth-hash coin per (doc, position) — no RNG."""
    docs = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    pos = F.sequence(F.lit(0), F.lit(TOKENS_PER_DOC - 1))
    coin = lambda i: (F.col("doc_id") * TOKENS_PER_DOC + i) * 2654435761 % 100
    tok = lambda i: F.when(coin(i) < hub_pct, F.lit("hub")).otherwise(
        F.concat(
            F.lit("t"),
            ((F.col("doc_id") * 31 + i * 7) * 40503 % VOCAB).cast("string"),
        )
    )
    toked = docs.select("doc_id", F.transform(pos, tok).alias("_toks"))
    t = F.col("_toks")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(t) - 1),
        lambda i: F.struct(
            F.element_at(t, i.cast("int")).alias("w1"),
            F.element_at(t, (i + 1).cast("int")).alias("w2"),
        ),
    )
    return (
        toked.select("doc_id", F.explode(grams).alias("g"))
        .select("doc_id", "g.w1", "g.w2")
    )


def _final_agg(enriched):
    return (
        enriched.withColumn(
            "surprise_ppm",
            F.expr("w1_count * 1000000 div pair_count").cast("long"),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("surprise_ppm").alias("_s"),
            F.max("surprise_ppm").alias("max_surprise_ppm"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            F.expr("_s div n_bigrams").cast("long").alias("avg_surprise_ppm"),
            "max_surprise_ppm",
        )
    )


def variant_window(pairs):
    enriched = pairs.withColumn(
        "pair_count", F.count(F.lit(1)).over(Window.partitionBy("w1", "w2"))
    ).withColumn("w1_count", F.count(F.lit(1)).over(Window.partitionBy("w1")))
    return _final_agg(enriched)


def variant_salted(pairs):
    # the library form of this variant (promoted after the probe's
    # first run): (w1,salt) window partials -> tiny totals -> AQE-
    # splittable join back
    from financial_tracker_etl_spark.operators.skew import (
        salted_window_count,
    )

    with_pairs = pairs.withColumn(
        "pair_count", F.count(F.lit(1)).over(Window.partitionBy("w1", "w2"))
    )
    return _final_agg(
        salted_window_count(
            with_pairs,
            ["w1"],
            salt_from=["doc_id", "w2"],
            buckets=SALT,
            out_col="w1_count",
        )
    )


def timed(df) -> float:
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000  # 8x sf0.1
    hub_pct = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    spark = get_spark("skew-probe-r9")
    pairs = synthetic_pairs(spark, n_docs, hub_pct)
    n = pairs.count()
    hub = pairs.filter(F.col("w1") == "hub").count()
    draws = {"window": [], "salted": []}
    for _ in range(4):  # interleaved pairs; first pair discarded
        draws["window"].append(timed(variant_window(pairs)))
        draws["salted"].append(timed(variant_salted(pairs)))
    med = lambda xs: sorted(xs[1:])[len(xs[1:]) // 2]
    print(
        json.dumps(
            {
                "n_bigrams": n,
                "hub_share": round(hub / n, 4),
                "window_draws": [round(x, 2) for x in draws["window"]],
                "salted_draws": [round(x, 2) for x in draws["salted"]],
                "window_median": round(med(draws["window"]), 2),
                "salted_median": round(med(draws["salted"]), 2),
            }
        )
    )


if __name__ == "__main__":
    main()
