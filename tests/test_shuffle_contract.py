"""Shuffle/spill audit promoted from script to test contract
(round-13 VERDICT task 2).

scripts/shuffle_audit_r13.py proved the whole bench set spill-free
with bounded exchanges at sf0.1, but only ran when someone remembered
to run it. This module asserts the same invariants automatically at
sf0.01 over every bench-flagged registry query, so a future plan
change that introduces a fat shuffle or an operator spill trips the
suite instead of waiting for a manual audit:

- zero operator spill (``spillSize`` SQLMetrics, counted once per
  physical node — ``plan_io_summary`` skips ReusedExchange aliases);
- per-query max-exchange ceiling: every ceiling is >=4x the round-14
  measured value at sf0.01 (measured table in BASELINE.md round-14
  section), so in-band variation passes and a shape regression (a new
  unexpectedly-fat exchange) fails.

Scope: the final-plan walk cannot see exchanges that ran in jobs
behind persisted intermediates (purchase_graph_pagerank,
minhash_lsh_near_dups report 0 here by construction) and node
SQLMetrics never include shuffle-WRITE spill; both are covered by the
stage-level REST path in scripts/shuffle_audit_r14.py
(profile.stage_delta_metrics), which needs SPARK_GRAFT_UI=1 and so
runs as the per-round audit rather than in this UI-less suite.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from financial_tracker_etl_spark.profile import (  # noqa: E402
    NodeMetrics,
    collect_metrics,
    plan_io_summary,
    stage_delta_metrics,
)

SF_DIR = "/root/testdata/sf0.01"

KB = 1024
MB = 1024 * KB

# Max single-exchange ceiling per bench query at sf0.01 (bytes).
# Round-14 measured values (BASELINE.md): largest was
# duplicate_span_stats at 983,541 B; most are KB-scale. Ceilings are
# >=4x measured with a 1 MB floor so ordinary row-count jitter never
# trips, while a shape regression (e.g. a projection lost before a
# shuffle, a broadcast demoted to exchange-both-sides) does.
DEFAULT_CEILING = 1 * MB
EXCHANGE_CEILING = {
    "doc_price_indicators": 2 * MB,  # measured 379,880
    "stream_upsert_market_data": 2 * MB,  # measured 322,246
    "asof_quote_join": 2 * MB,  # measured 420,160
    "events_hourly_rollup": 2 * MB,  # measured 258,166
    "top_revenue_customers": 2 * MB,  # measured 281,083
    "duplicate_span_stats": 4 * MB,  # measured 983,541
}


def _bench_specs():
    from financial_tracker_etl_spark.queries import registry

    return {
        name: spec
        for name, spec in registry().items()
        if spec.bench or spec.bench_tail
    }


def test_bench_set_spill_free_and_exchanges_bounded(spark):
    specs = _bench_specs()
    assert len(specs) == 19, sorted(specs)
    failures = []
    for name, spec in specs.items():
        spark.catalog.clearCache()
        summary = plan_io_summary(collect_metrics(spec.fn(spark, SF_DIR)))
        ceiling = EXCHANGE_CEILING.get(name, DEFAULT_CEILING)
        if summary["spill_bytes"] != 0:
            failures.append(f"{name}: operator spill {summary['spill_bytes']} B")
        if summary["shuffle_max_exchange_bytes"] > ceiling:
            failures.append(
                f"{name}: max exchange {summary['shuffle_max_exchange_bytes']} B"
                f" > ceiling {ceiling} B"
            )
    assert not failures, "\n".join(failures)


def test_plan_io_summary_skips_reused_subtrees():
    """Round-13 ADVICE low: ReusedExchange descends into the ORIGINAL
    subtree (same accumulators), so naive summing counted each reused
    exchange/scan twice. plan_io_summary must count flagged nodes
    zero times and everything else once."""
    rows = [
        NodeMetrics(0, "Project", {}),
        NodeMetrics(1, "Exchange", {"shuffleBytesWritten": 100}),
        NodeMetrics(2, "Scan parquet", {"filesSize": 1000}),
        NodeMetrics(1, "ReusedExchange", {"shuffleBytesWritten": 100}, True),
        NodeMetrics(2, "Exchange", {"shuffleBytesWritten": 100}, True),
        NodeMetrics(3, "Scan parquet", {"filesSize": 1000}, True),
        NodeMetrics(1, "Sort", {"spillSize": 7}),
    ]
    s = plan_io_summary(rows)
    assert s["shuffle_total_bytes"] == 100
    assert s["n_exchanges"] == 1
    assert s["scan_bytes"] == 1000
    assert s["spill_bytes"] == 7
    assert s["shuffle_max_exchange_bytes"] == 100
    # empty plans degrade to zeros, never a ValueError (the r13 audit
    # script crashed on max() over an empty sequence)
    empty = plan_io_summary([])
    assert empty["shuffle_max_exchange_bytes"] == 0
    assert empty["n_exchanges"] == 0


def test_collect_metrics_flags_reused_descendants(spark):
    """A self-joined aggregate reuses one exchange subtree; the walk
    must flag the aliased copy so summers count the physical exchange
    once. Skips (never fails) if AQE happens not to produce a
    ReusedExchange for this shape on some future Spark version."""
    from pyspark.sql import functions as F

    df = (
        spark.read.parquet(os.path.join(SF_DIR, "nation.parquet"))
        .groupBy("n_regionkey")
        .agg(F.count("*").alias("n"))
    )
    joined = df.alias("a").join(
        df.alias("b"), on="n_regionkey"
    )
    rows = collect_metrics(joined)
    names = [r.name for r in rows]
    if not any(n.startswith("Reused") for n in names):
        pytest.skip("plan produced no ReusedExchange on this version")
    reused = [r for r in rows if r.reused]
    assert reused, "Reused wrapper present but no descendant was flagged"
    # the wrapper row ITSELF is flagged (round-14 ADVICE low: an
    # unflagged wrapper would double-count if a future Spark surfaced
    # the original's aliased accumulators on it)
    assert all(r.reused for r in rows if r.name.startswith("Reused"))
    # the aliased subtree repeats a real exchange whose aliased
    # accumulators a naive sum double-counts — dedup must STRICTLY
    # shrink the total, or it has silently become a no-op
    assert any(
        r.reused and r.metrics.get("shuffleBytesWritten", 0) > 0
        for r in rows
    ), "reused subtree carries no aliased shuffle metric to dedup"
    naive = sum(
        r.metrics.get("shuffleBytesWritten", 0) for r in rows
    )
    deduped = plan_io_summary(rows)["shuffle_total_bytes"]
    assert deduped < naive


def test_stage_delta_metrics_identifies_new_stages(monkeypatch):
    """Stage deltas are computed from NEW (stageId, attemptId) keys,
    not cumulative-sum subtraction, so old-stage eviction cannot skew
    the delta; None degrades when the UI is off."""
    from financial_tracker_etl_spark import profile

    before = {(1, 0): {"stageId": 1, "attemptId": 0, "shuffleWriteBytes": 999}}
    after = dict(before)
    after[(2, 0)] = {
        "stageId": 2,
        "attemptId": 0,
        "shuffleWriteBytes": 50,
        "shuffleReadBytes": 50,
        "inputBytes": 10,
        "memoryBytesSpilled": 3,
        "diskBytesSpilled": 4,
    }
    after[(3, 0)] = {
        "stageId": 3,
        "attemptId": 0,
        "shuffleWriteBytes": 70,
    }
    monkeypatch.setattr(profile, "stage_snapshot", lambda spark: after)
    d = stage_delta_metrics(None, before)
    assert d["shuffleWriteBytes"] == 120
    assert d["max_stage_shuffle_write_bytes"] == 70
    assert d["memoryBytesSpilled"] == 3 and d["diskBytesSpilled"] == 4
    assert d["n_stages"] == 2
    # UI off in either direction -> None (detection unavailable)
    assert stage_delta_metrics(None, None) is None
    monkeypatch.setattr(profile, "stage_snapshot", lambda spark: None)
    assert stage_delta_metrics(None, before) is None


def test_bench_set_spill_free_on_skewed_input(spark, tmp_path):
    """Round-16 VERDICT task 2(b): the zero-spill contract must hold
    when ~35% of events.user_id / lineitem.l_partkey / documents.source
    collapse onto one hub value (fuzz.py's ``skew`` class), not just on
    the uniform fixtures — a hub key concentrates one window/group
    partition with a third of the table, which is exactly where a
    sort-window or hash-agg starts spilling first. Exchange ceilings
    are rechecked too (totals move only marginally: the same rows
    shuffle, just unevenly).

    Ledger note (BASELINE.md round-16): at sf0.01 no bench query needs
    the salted form under a 35% hub — zero spill across all 19; the
    round-9 salting threshold rule stays an escape hatch, now tested
    rather than documented-only."""
    from financial_tracker_etl_spark.fuzz import mutate_dir

    skew_dir = str(tmp_path / "skewed_sf001")
    mutate_dir(SF_DIR, skew_dir, seed=16, mutations=("skew",))
    specs = _bench_specs()
    failures = []
    for name, spec in specs.items():
        spark.catalog.clearCache()
        summary = plan_io_summary(collect_metrics(spec.fn(spark, skew_dir)))
        ceiling = EXCHANGE_CEILING.get(name, DEFAULT_CEILING)
        if summary["spill_bytes"] != 0:
            failures.append(
                f"{name}: operator spill {summary['spill_bytes']} B (skewed)"
            )
        if summary["shuffle_max_exchange_bytes"] > ceiling:
            failures.append(
                f"{name}: max exchange {summary['shuffle_max_exchange_bytes']} B"
                f" > ceiling {ceiling} B (skewed)"
            )
    assert not failures, "\n".join(failures)
