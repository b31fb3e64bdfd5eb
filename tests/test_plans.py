"""Physical-plan regression guards.

Correctness is the oracle harness's job; these tests pin the *plan
shapes* that make the engine scale — broadcast joins for small
request/dimension sides, parquet filter pushdown, and single-shuffle
merges. A change that silently turns a broadcast anti-join into a
sort-merge join or un-pushes a scan filter passes the oracle but dies
at 100 TB; it should fail here instead."""

from __future__ import annotations

import re

import pytest

from conftest import SF_DIR


def plan_of(df) -> str:
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def n_ops(plan: str, name: str) -> int:
    return len(re.findall(rf"^\s*\(\d+\) {re.escape(name)}(?!\w)", plan, re.M))


@pytest.fixture(scope="module")
def reg():
    from financial_tracker_etl_spark.queries import registry

    return registry()


def test_j1_anti_join_broadcasts_requests(spark, reg):
    plan = plan_of(reg["j1_symbols_needing_update"].fn(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


def test_flagship_spine_join_broadcasts(spark, reg):
    plan = plan_of(reg["flagship_historical_repair"].fn(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    # gap detection must not degrade to a shuffle join of the spine
    assert "SortMergeJoin" not in plan


def test_parquet_filters_are_pushed(spark, reg):
    plan = plan_of(reg["upsert_market_data"].fn(spark, SF_DIR))
    assert "PushedFilters: [IsNotNull(l_linenumber), EqualTo(l_linenumber,1)" in plan


def test_upsert_is_single_shuffle_merge(spark, reg):
    """The keyed merge needs exactly one exchange on the upsert key for
    the window dedupe (plus the two scan-side agg exchanges); the
    two-stage formulation had four. WindowGroupLimit must kick in so
    per-key top-1 is computed partially before the shuffle."""
    plan = plan_of(reg["upsert_market_data"].fn(spark, SF_DIR))
    assert n_ops(plan, "Window") == 1
    assert "WindowGroupLimit" in plan
    assert n_ops(plan, "Exchange") <= 3


def test_topk_window_uses_group_limit(spark, reg):
    plan = plan_of(reg["embedding_topk_cosine"].fn(spark, SF_DIR))
    # rank<=k must push into WindowGroupLimit, not rank all pairs
    assert "WindowGroupLimit" in plan
    # corpus side never shuffles for the scoring join: query side is
    # broadcast (nested-loop on the != predicate is expected and fine)
    assert "BroadcastNestedLoopJoin" in plan


def test_scans_prune_columns(spark, reg):
    plan = plan_of(reg["j5_coverage_index"].fn(spark, SF_DIR))
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = m.group(1)
    # only the 3 columns the query touches, out of 16 lineitem columns
    assert "l_partkey" in cols and "l_shipdate" in cols
    assert "l_comment" not in cols and "l_quantity" not in cols


def test_bucketed_join_has_no_shuffle(spark, reg):
    """Bucketed-by-key state tables join/merge with ZERO exchanges —
    the co-located path a 100 TB continuously-merged table runs on."""
    from pyspark.sql import functions as F

    from financial_tracker_etl_spark import fixtures
    from financial_tracker_etl_spark.catalog import load_table
    from financial_tracker_etl_spark.operators.bucketing import write_bucketed

    md = fixtures.market_data(load_table(spark, SF_DIR, "lineitem"))
    write_bucketed(md, "md_state_a", ["symbol"], buckets=8)
    write_bucketed(
        md.select("symbol", F.col("price").alias("price2")),
        "md_state_b",
        ["symbol"],
        buckets=8,
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a non-broadcast plan so the bucket layout is what
        # eliminates the shuffle, not a broadcast
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("md_state_a").join(
            spark.table("md_state_b"), "symbol"
        )
        plan = plan_of(joined)
        assert "SortMergeJoin" in plan
        assert n_ops(plan, "Exchange") == 0, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_colocated_query_join_has_no_shuffle(spark, reg):
    """The registry's bucketed_colocated_join stages both sides as
    8-bucket tables once per sf; the join itself must then plan with
    ZERO exchanges even with broadcast disabled — the bucket layout,
    not a broadcast, is what removes the shuffle."""
    from financial_tracker_etl_spark.queries.analytics import bucketed_join

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = plan_of(bucketed_join(spark, SF_DIR))
        assert "SortMergeJoin" in plan
        assert n_ops(plan, "Exchange") == 0, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_binned_range_join_avoids_nested_loop(spark, reg):
    """The interval predicate alone would plan a BNLJ; the bin
    discretization must turn it into a hash join on the bin key."""
    plan = plan_of(reg["binned_range_join"].fn(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_salted_window_count_joins_hash_not_nested_loop(spark):
    """The round-10 eqNullSafe join-back (NULL-key fix) must still
    plan as a hash join: Spark rewrites null-safe equality into
    coalesce/isnull hash keys, so the tiny totals side broadcasts —
    a BNLJ or CartesianProduct here would be a scale-killer in the
    helper's whole reason to exist (hot-key corpora)."""
    from financial_tracker_etl_spark.operators.skew import salted_window_count

    df = spark.range(10_000).selectExpr("cast(id % 97 as string) k", "id seq")
    plan = plan_of(salted_window_count(df, ["k"], salt_from=["seq"]))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "ShuffledHashJoin" in plan


def test_skew_safe_distinct_spreads_first_shuffle(spark, reg):
    """The first exchange must partition on BOTH (event_type, user_id)
    — the skew-spreading composite key — never on event_type alone."""
    plan = plan_of(reg["skew_safe_count_distinct"].fn(spark, SF_DIR))
    parts = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    assert parts, plan
    # the deepest exchange (first in the detail listing) carries the
    # composite key; the second only re-keys the deduped pairs
    assert "event_type" in parts[0] and "user_id" in parts[0], parts


def test_time_rollup_scans_events_once(spark, reg):
    """The hour→day→week cascade re-aggregates partials; the raw
    events table must appear exactly once in the plan."""
    plan = plan_of(reg["hierarchical_time_rollup"].fn(spark, SF_DIR))
    assert plan.count("events.parquet") == 1, plan


def test_no_unbounded_global_window_in_any_query(spark, reg):
    """No query may plan an UNPARTITIONED WindowExec over unbounded
    input: `Window.orderBy(...)` without partitioning moves every row
    to ONE partition — the 100 TB scale-killer the round-1 bench tail
    warned about on top_revenue_customers. A global window is tolerated
    only directly above a TakeOrderedAndProject/Limit (bounded rows,
    e.g. ranking an already-taken top-k).

    In the physical-plan string a partitioned+ordered window prints
    `Window [exprs], [partcols], [order]` (two `], [` separators); an
    unpartitioned ordered one prints `Window [exprs], [order]` — one
    separator and ASC/DESC in the final group. Partition-only windows
    (`Window [exprs], [partcols]`) also have one separator but no
    ASC/DESC, and are fine.
    """
    skip = {n for n in reg if n.startswith("stream_")}  # eager pipeline
    offenders = []
    for name, spec in reg.items():
        if name in skip:
            continue
        plan = (
            spec.fn(spark, SF_DIR)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        lines = plan.splitlines()
        for i, line in enumerate(lines):
            m = re.search(r"\bWindow \[", line)
            if not m or line.count("], [") >= 2:
                continue
            last_group = line.rsplit("], [", 1)[-1]
            if not re.search(r"\b(ASC|DESC)\b", last_group):
                continue  # partition-only window, no global sort
            # bounded input is fine: the window's subtree must contain a
            # limit-class node before the next same-or-shallower node
            subtree = "\n".join(lines[i + 1 : i + 6])
            if "TakeOrderedAndProject" in subtree or "GlobalLimit" in subtree:
                continue
            offenders.append((name, line.strip()[:100]))
    assert not offenders, offenders


def test_cosine_near_dups_is_bucketed_not_all_pairs(spark, reg):
    """The near-dup pair query must generate candidates via EQUI-joins
    on the LSH half-bucket keys (hash-partitionable at any scale) —
    never the O(N^2/2) `vec_id < vec_id` cross product round 1 shipped
    (a nested-loop join). The exact all-pairs twin exists only as the
    test baseline (cosine_near_dup_pairs_exact)."""
    plan = plan_of(reg["embedding_cosine_near_dups"].fn(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_contamination_broadcasts_benchmark_side(spark, reg):
    """The benchmark shingle set is small by definition (eval sets);
    the corpus-sided scan must probe it via broadcast — a shuffle of
    the corpus shingles against the bench side would move the 100 TB
    side for a KB-sized lookup."""
    plan = plan_of(reg["benchmark_contamination"].fn(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_tfidf_computes_doc_freq_without_joins(spark, reg):
    """doc-frequency comes from a whole-partition window over the tf
    table's term key — a single pass, never a join back onto the tf
    subtree (the round-6 rewrite: the old groupBy→broadcast-join-back
    computed tf twice and broadcast a vocabulary-sized table, which is
    unbounded with junk tokens at 100 TB)."""
    plan = plan_of(reg["tfidf_keywords"].fn(spark, SF_DIR))
    assert n_ops(plan, "Window") >= 1
    assert "Join" not in plan
    # the corpus explode+tf subtree appears exactly once
    assert plan.count("documents.parquet") == 1


def test_token_mix_broadcasts_rates_and_stays_narrow(spark, reg):
    """Per-source keep-rates are a sources-sized table; attaching them
    to the corpus must broadcast. The corpus side's only wide op is
    the final per-source summary aggregation."""
    plan = plan_of(reg["token_budget_mix"].fn(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_no_cartesian_and_nlj_only_on_allowlist(spark, reg):
    """Sweeping scale guard over EVERY registry query plan: no
    CartesianProduct anywhere, and BroadcastNestedLoopJoin only where
    the broadcast side is a scalar/tiny-by-construction table —
    1-row aggregate totals (token_budget_mix, brand_revenue_share) or
    the small broadcast query set scored against the streamed corpus
    (the top-k/ANN family, whose non-equi predicates can't hash-join).
    Any new query that plans a cartesian or an unlisted NLJ is a
    100 TB incident, not a style choice."""
    allow_nlj = {
        "incremental_dedup_new_docs",  # 1-row batch-boundary broadcast
        "token_budget_mix",
        "brand_revenue_share",
        "histogram_quantile_sketch",  # 1-row global-range broadcast
        "hll_shard_merge",  # 1-row exact-count × 1-row merged-sketch
        "dormant_rich_customers",  # 1-row global-average broadcast
        "brand_association_rules",  # 1-row global basket-count broadcast
        "sequence_bigram_support",  # 1-row distinct-user-count broadcast
        "nb_quality_filter",  # 1-row corpus-total broadcast (train step)
        "bm25_doc_ranking",  # 1-row (N, total_tokens) corpus-stats broadcast
        "key_skew_report",  # 1-row grand-total broadcast
        "referential_integrity_audit",  # 1-row x 1-row report assembly
        "value_drift_report",  # 1-row global ts/value-bounds broadcast
        "embedding_topk_cosine",
        "embedding_ann_ivf",
        "embedding_ann_ivfpq",  # same broadcast centroid/query scoring
        # block-offset prefix: non-equi broadcast self-join over the
        # ~#docs/64-row block-totals table, never over documents
        "pps_weighted_sample",
        "curation_pipeline_v2",  # same PPS block-offset join, inherited
    }
    offenders = []
    for name, spec in reg.items():
        if name.startswith("stream_"):
            continue  # eager pipeline, covered by its own runtime tests
        plan = plan_of(spec.fn(spark, SF_DIR))
        if "CartesianProduct" in plan:
            offenders.append((name, "CartesianProduct"))
        if "BroadcastNestedLoopJoin" in plan and name not in allow_nlj:
            offenders.append((name, "BroadcastNestedLoopJoin"))
    assert not offenders, offenders


def test_join_strategy_hints_are_honored(spark, reg):
    """The three physical join strategies are selectable per join via
    hints — the lever a 100 TB tuning pass actually uses: broadcast
    for dim tables, shuffle_hash to skip the sort when one side is
    modest, merge for the big-big default."""
    from financial_tracker_etl_spark.catalog import load_table

    orders = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        cases = {
            "broadcast": "BroadcastHashJoin",
            "shuffle_hash": "ShuffledHashJoin",
            "merge": "SortMergeJoin",
        }
        for hint, node in cases.items():
            plan = plan_of(
                li.join(orders.hint(hint), li.l_orderkey == orders.o_orderkey)
            )
            assert node in plan, (hint, plan)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_persisted_staging_preserves_partitioning_for_iteration_joins(spark):
    """The iterative-graph operators (ext.graph.pagerank / bfs_hops,
    ext.cluster.connected_components) stage their static edge side as
    persist(repartition(key).sortWithinPartitions(key)) so every
    round's sort-merge join moves only the small evolving vector. That
    rests on two Spark behaviors this test pins:

    - a cached InMemoryRelation KEEPS outputPartitioning/ordering, so
      the staged side joins with NO Exchange and NO Sort;
    - a localCheckpoint LogicalRDD does NOT (it must re-exchange) —
      the trap the round-4 rework removed.
    """
    from pyspark.sql import functions as F

    def live_plan(df) -> str:
        """Simple-mode plan with every InMemoryRelation SUBTREE removed
        (the cached build plan is printed inline and contains its own
        one-time Exchange, which is not part of what runs per join)."""
        lines = df._jdf.queryExecution().executedPlan().toString().splitlines()
        out, skip_indent = [], None
        for ln in lines:
            indent = len(ln) - len(ln.lstrip(" :+-*("))
            if skip_indent is not None and indent > skip_indent:
                continue
            skip_indent = None
            if "InMemoryRelation" in ln:
                skip_indent = indent
                continue
            out.append(ln)
        return "\n".join(out)

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        edges = spark.range(10_000).select(
            (F.col("id") % 500).alias("src"), F.col("id").alias("dst")
        )
        vec = spark.range(500).withColumnRenamed("id", "node")

        staged = (
            edges.repartition("src").sortWithinPartitions("src").persist()
        )
        staged.count()
        plan = live_plan(staged.join(vec, staged["src"] == vec["node"]))
        # exactly ONE exchange/sort pair: the vec side; the staged side
        # reads straight from cache
        assert "InMemoryTableScan" in plan
        assert plan.count("Exchange") == 1, plan
        assert plan.count("Sort ") == 1, plan
        staged.unpersist(blocking=False)

        ckpt = (
            edges.repartition("src")
            .sortWithinPartitions("src")
            .localCheckpoint(eager=True)
        )
        plan = live_plan(ckpt.join(vec, ckpt["src"] == vec["node"]))
        # the checkpointed side loses its layout: both sides exchange
        assert plan.count("Exchange") == 2, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_registry_rotation_structure(reg):
    """The driver gate checks exactly the first 50 registry entries, so
    registry ORDER is load-bearing. Pin the steady 3-round rotation
    arithmetic (in effect since round 6): prefix = _CHECK_FIRST = the
    block whose newest driver row is oldest (round 16: the
    CORRECTNESS_r13.json key set, 3 rounds stale after coasting
    through rounds 14-15 — the round-15 VERDICT task 1 mandate),
    suffix = _CHECK_LAST = the freshest block (round 16: the
    r05/r09/r12 key set, re-proven as the round-15 gate in
    CORRECTNESS_r15.json), no duplicates, 150 total, and
    prefix/suffix disjoint so every query's driver row ends the round
    at most two rounds old. Round-17 rotation: prefix = the r04/r07/
    r08/r11/r14 block (the middle this round), suffix = this round's
    prefix (r13 keys)."""
    import json
    import pathlib

    from financial_tracker_etl_spark.queries import _CHECK_FIRST, _CHECK_LAST

    names = list(reg)
    assert len(names) == 150 and len(set(names)) == 150
    assert len(_CHECK_FIRST) == 50 and len(_CHECK_LAST) == 50
    assert names[:50] == _CHECK_FIRST
    assert names[-len(_CHECK_LAST):] == _CHECK_LAST
    root = pathlib.Path(__file__).resolve().parents[1]
    r13 = root / "CORRECTNESS_r13.json"
    r15 = root / "CORRECTNESS_r15.json"
    if r13.exists() and r15.exists():
        assert set(_CHECK_FIRST) == set(json.loads(r13.read_text()))
        assert set(_CHECK_LAST) == set(json.loads(r15.read_text()))
        assert not (set(_CHECK_FIRST) & set(_CHECK_LAST))


def test_ladder_patches_every_load_table_binding(spark):
    """Regression for the round-5 advisory HIGH: _patched_loader
    hand-listed query modules and missed plans.historical_repair's
    module-level load_table binding, so its five queries laddered on
    UNREPLICATED input (flat rungs were artifacts). The loader must now
    discover and swap EVERY package module holding the catalog binding,
    and replication must actually multiply rows through the
    historical-repair path."""
    from financial_tracker_etl_spark import catalog
    from financial_tracker_etl_spark.ladder import _patched_loader
    from financial_tracker_etl_spark.plans import historical_repair

    base = catalog.load_table
    with _patched_loader(3):
        assert historical_repair.load_table is not base
        # every module-level binding in the package is swapped
        import importlib
        import pkgutil

        import financial_tracker_etl_spark as pkg

        for info in pkgutil.walk_packages(pkg.__path__, pkg.__name__ + "."):
            if info.name.endswith(".ladder"):
                continue
            mod = importlib.import_module(info.name)
            bound = getattr(mod, "load_table", None)
            assert bound is not base, f"{info.name} still holds the unpatched binding"
        n1 = historical_repair.load_table(
            spark, "/root/testdata/sf0.001", "lineitem"
        ).count()
    n0 = catalog.load_table(spark, "/root/testdata/sf0.001", "lineitem").count()
    assert historical_repair.load_table is base
    assert n1 == 3 * n0


def test_ladder_loader_warns_on_module_import_failure(spark, monkeypatch):
    """Round-6 ADVICE low: a module that fails to import during the
    loader's package walk could silently hold an unpatched load_table
    binding (the round-5 unreplicated-input bug class). Non-query
    modules must WARN with the failed names; a query/plan module
    failing must raise. Round-7 ADVICE low: patch via the monkeypatch
    fixture (scoped restoration even if the assertion machinery itself
    raises), and the fail-loud path is a RuntimeError, not an assert
    (must survive `python -O`)."""
    import importlib

    import pytest

    from financial_tracker_etl_spark.ladder import _patched_loader

    real_import = importlib.import_module

    def flaky(name, *a, **kw):
        if name == "financial_tracker_etl_spark.ext.multimodal":
            raise ImportError("simulated capability-missing module")
        return real_import(name, *a, **kw)

    monkeypatch.setattr(importlib, "import_module", flaky)
    with pytest.warns(UserWarning, match="ext.multimodal"):
        with _patched_loader(2):
            pass

    def flaky_query_mod(name, *a, **kw):
        if name == "financial_tracker_etl_spark.queries.ext":
            raise ImportError("simulated")
        return real_import(name, *a, **kw)

    monkeypatch.setattr(importlib, "import_module", flaky_query_mod)
    with pytest.raises(RuntimeError, match="queries"):
        with pytest.warns(UserWarning):
            with _patched_loader(2):
                pass


def test_ladder_replicas_are_new_entities_not_key_collisions(spark):
    """Replicated fact keys must be NEW key values (upcast to long
    before offsetting), never 32-bit wraps onto existing keys, and the
    embedding rotation must preserve the true vector width."""
    from pyspark.sql import functions as F

    from financial_tracker_etl_spark import catalog
    from financial_tracker_etl_spark.ladder import replicate

    k = 3
    cust = catalog.load_table(spark, "/root/testdata/sf0.001", "customer")
    rep = replicate(cust, "customer", k)
    assert rep.schema["c_custkey"].dataType.typeName() == "long"
    assert rep.select("c_custkey").distinct().count() == k * cust.count()

    emb = catalog.load_table(spark, "/root/testdata/sf0.001", "embeddings")
    dim = emb.select(F.size("embedding").alias("d")).head()["d"]
    rep_e = replicate(emb, "embeddings", k)
    sizes = rep_e.select(F.size("embedding").alias("d")).distinct().collect()
    assert [r["d"] for r in sizes] == [dim]
    # rotated replicas keep the norm (same multiset of components)
    base_norm = emb.select(
        F.round(F.aggregate("embedding", F.lit(0.0), lambda a, x: a + x * x), 4).alias("n")
    ).agg(F.sum("n")).first()[0]
    rep_norm = rep_e.select(
        F.round(F.aggregate("embedding", F.lit(0.0), lambda a, x: a + x * x), 4).alias("n")
    ).agg(F.sum("n")).first()[0]
    assert abs(rep_norm - k * base_norm) < 1e-6 * k * abs(base_norm)


def test_single_pass_rewrites_hold_their_scan_counts(spark, reg):
    """The round-6 sweep replaced aggregate→filter→join-back shapes
    (which re-execute their corpus-sized explode subtrees) with
    in-place whole-partition window statistics over high-cardinality
    keys. Pin each rewritten query's source-scan count so a regression
    back to the multi-scan shape fails here, not on the cluster."""
    # (table, max textual scan mentions, require staged cache). The
    # round-16 novelty rewrite feeds its two consumers from ONE
    # persisted shingle-set pass: the scan EXECUTES once (behind an
    # InMemoryTableScan) but its subtree is INLINED into the plan text
    # at every cached-frame reference, so the textual count rises to 4
    # while the executed scans fall to 1. For such staged queries the
    # guard is the cache marker: removing the persist would drop the
    # InMemoryTableScan (and re-execute the explode per consumer),
    # failing here.
    limits = {
        "doc_lm_perplexity": ("documents.parquet", 1, False),
        "ngram_novelty_scores": ("documents.parquet", 4, True),
        "chunk_level_dedup": ("documents.parquet", 1, False),
        "tfidf_keywords": ("documents.parquet", 1, False),
        # grams + totals
        "duplicate_span_stats": ("documents.parquet", 2, False),
        # st + size-sum
        "source_vocab_divergence": ("documents.parquet", 2, False),
        # pos, filters, srcs
        "bloom_source_overlap": ("documents.parquet", 3, False),
        "brand_association_rules": ("lineitem.parquet", 5, False),
    }
    for name, (table, max_scans, needs_cache) in limits.items():
        plan = (
            reg[name]
            .fn(spark, SF_DIR)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        n = plan.count(table)
        assert n <= max_scans, f"{name}: {n} scans of {table} (max {max_scans})"
        if needs_cache:
            assert "InMemoryTableScan" in plan, (
                f"{name}: staged single-pass shape lost its persist — "
                "every reference would re-execute the corpus subtree"
            )


def test_windowexec_warning_suppressed(spark):
    """Round-7 judge task 8: the three bounded-input global windows
    (≤20-row post-limit ranks, |sources|-row grand total) are benign
    but WindowExec WARNs on every execution, polluting driver logs. A
    constant partition key cannot fix it on Spark 4
    (EliminateWindowPartitions folds it back to the empty spec), so
    the session factory pins the WindowExec logger to ERROR — exactly
    as narrow as the benign signal."""
    jvm = spark.sparkContext._jvm
    level = jvm.org.apache.logging.log4j.LogManager.getLogger(
        "org.apache.spark.sql.execution.window.WindowExec"
    ).getLevel()
    assert str(level) == "ERROR"
