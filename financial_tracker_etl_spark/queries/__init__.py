"""Query registry: every implemented operator exposed as a named query.

Each :class:`QuerySpec` pairs a Spark callable ``(spark, sf_dir) ->
DataFrame`` with the equivalent DuckDB oracle SQL (None for genuinely
non-SQL-expressible ops, which the driver checks rows-only). The driver
contract (``__spark_entry__.py``) is a thin view over this registry.

Column-name parity between the two sides is load-bearing: the driver
sorts columns by name before hashing values.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    bench: bool = False  # include in bench.py headline set
    # bench.py tail group: newest heavy queries, timed in the same run
    # but summed separately so the 14-query headline total stays
    # comparable across rounds (round-3 judge task 3)
    bench_tail: bool = False


# The driver's CORRECTNESS gate checks exactly the first 50 registry
# entries, so registry order is a correctness-visibility lever and the
# prefix is an explicit priority list, rotated each round so that every
# query's green evidence is at most one round old (COVERAGE.md records
# the per-query last-green round).
#
# After round 5 the 150 registry queries partition exactly into three
# 50-query blocks by newest driver row: round 3 / round 4 / round 5
# (verified: the CORRECTNESS_r0{3,4,5}.json key sets are disjoint and
# cover the registry). From here the gate runs a steady 3-round
# rotation so no query's green evidence is ever older than two rounds:
#
# ROUND-16 prefix: the round-6/10/13 block — exactly the
# CORRECTNESS_r13.json key set, whose newest driver rows are now the
# oldest (3 rounds stale after coasting through rounds 14-15), as the
# round-15 VERDICT task 1 mandates. Suffix: the round-5/9/12 block
# (re-proven as the round-15 gate — CORRECTNESS_r15.json — the
# freshest evidence, coasts this round); the round-4/7/8/11/14 block
# sits in the middle and becomes the round-17 prefix.
#
# Registry remains FROZEN at 150 (round-4 judge task 2; reaffirmed by
# the round-4/5/6 VERDICTs). The thirteen round-4 twin retirements and
# their named covering queries are recorded in COVERAGE.md.
#
_CHECK_FIRST = [
    "a1_historical_batches",
    "a4_latest_monthly_price",
    "asof_quote_join",
    "brand_revenue_share",
    "cdc_market_changes",
    "cube_monthly_summary",
    "dedup_clusters",
    "doc_fingerprints",
    "duplicate_span_stats",
    "embedding_ann_pq",
    "embedding_topk_cosine",
    "events_funnel_stages",
    "events_hourly_anomalies",
    "events_hourly_rollup",
    "events_props_rollup",
    "events_sessionization",
    "events_weekly_retention",
    "historical_fetch_windows",
    "historical_repair_summary",
    "hll_distinct_users",
    "j1_symbols_needing_update",
    "j2_existing_state_semi_join",
    "j4_coverage_counts",
    "j5_coverage_index",
    "longest_month_gap",
    "multimodal_decode_features",
    "ngram_jaccard_near_dups",
    "order_priority_count",
    "p1_invalid_quote_rows",
    "p2_index_quote_projection",
    "p4_typed_quotes",
    "p5_payload_envelopes",
    "pivot_monthly_by_type",
    "pricing_summary",
    "quantiles_by_returnflag",
    "region_nation_rollup",
    "s6_asset_dispatch",
    "stream_dedup_exact",
    "stream_events_hourly_rollup",
    "stream_interval_join",
    "stream_session_windows",
    "stream_static_enrichment",
    "text_language_id",
    "text_quality_scores",
    "text_token_stats",
    "top_revenue_customers",
    "training_shard_plan",
    "udtf_month_spine",
    "upsert_market_data",
    "x1_exact_dedup",
]

# Suffix: the 50 round-5/9/12-block queries — re-proven as the
# round-15 gate (CORRECTNESS_r15.json, 50/50 green), the freshest
# driver evidence, so they coast this round. The loop in registry()
# places the round-4/7/8/11/14-green block between the prefix and this
# suffix; the gate never reaches either.
_CHECK_LAST = [
    "activity_heatmap_cells",
    "benchmark_contamination",
    "bloom_source_overlap",
    "brand_association_rules",
    "chunk_level_dedup",
    "cohort_funnel_conversion",
    "corpus_curation_summary",
    "dedup_impact_by_source",
    "doc_lm_perplexity",
    "doc_price_indicators",
    "doc_token_chunks",
    "dormant_rich_customers",
    "dsir_importance_weights",
    "embedding_ann_ivf",
    "embedding_cosine_near_dups",
    "embedding_int8_quantize",
    "embedding_label_centroids",
    "flagship_historical_repair",
    "funnel_latency_quantiles",
    "historical_missing_months",
    "incremental_dedup_new_docs",
    "kmeans_assign_step",
    "lang_id_confusion_matrix",
    "leakage_safe_splits",
    "length_outlier_filter",
    "mad_quantity_by_flag",
    "minhash_lsh_near_dups",
    "nation_share_of_region",
    "pareto_top_decile_share",
    "pii_scrub_stats",
    "rolling_week_user_activity",
    "semantic_dedup_pairs",
    "seq_packing_plan",
    "sequence_bigram_support",
    "sessions_in_anomalous_hours",
    "simhash_near_dup_pairs",
    "source_vocab_divergence",
    "stream_pipeline_completions",
    "stream_stateful_ewma",
    "stream_upsert_market_data",
    "text_repetition_stats",
    "text_stratified_sample",
    "tfidf_keywords",
    "token_budget_mix",
    "top_parts_per_brand_with_ties",
    "user_modal_event_type",
    "user_type_diversity",
    "vocab_oov_rate",
    "weekly_stickiness",
    "winnow_overlap_pairs",
]


def registry() -> dict[str, QuerySpec]:
    from . import analytics, core, ext, stream

    merged: dict[str, QuerySpec] = {}
    for mod in (core, analytics, ext, stream):
        dup = set(merged) & set(mod.QUERIES)
        if dup:
            raise ValueError(f"duplicate query names: {dup}")
        merged.update(mod.QUERIES)
    out: dict[str, QuerySpec] = {}
    for name in _CHECK_FIRST:
        out[name] = merged[name]
    for name in merged:
        if name not in out and name not in _CHECK_LAST:
            out[name] = merged[name]
    for name in _CHECK_LAST:
        out[name] = merged[name]
    return out
