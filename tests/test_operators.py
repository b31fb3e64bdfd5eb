"""Pinned reference semantics (SURVEY.md §5) as unit tests over tiny
synthetic rows — the reference's mock-based unit style, upgraded."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import Row, functions as F

from financial_tracker_etl_spark.fixtures import KNOWN_ASSET_TYPES
from financial_tracker_etl_spark.operators.gaps import (
    fetch_windows,
    missing_months,
    month_spine,
)
from financial_tracker_etl_spark.operators.joins import (
    coverage_complete,
    symbols_needing_update,
)
from financial_tracker_etl_spark.operators.upsert import upsert_last_write_wins
from financial_tracker_etl_spark.operators.validation import (
    drop_unknown_asset_types,
    require_valid,
    split_valid,
)


def _assets(spark, rows):
    return spark.createDataFrame(rows, "symbol string, asset_type string")


def test_missing_required_field_raises_with_field_name(spark):
    # reference: tests/test_data_processing.py:123-157 pins the message
    df = spark.createDataFrame(
        [Row(close="1.0", change=None)], "close string, change string"
    )
    with pytest.raises(ValueError, match="Missing or invalid field 'change'"):
        require_valid(df, ["close", "change"])


def test_first_violating_field_wins(spark):
    # reference loop errors on the FIRST bad field (etl/fetch_utils.py:36-39)
    df = spark.createDataFrame([Row(a=None, b=None)], "a string, b string")
    _, invalid = split_valid(df, ["a", "b"])
    assert invalid.first()["error_field"] == "a"


def test_zero_negative_huge_values_are_valid(spark):
    # reference: tests/test_data_processing.py:366-404
    df = spark.createDataFrame(
        [Row(close="0"), Row(close="-5.5"), Row(close="1e308")],
        "close string",
    )
    valid, invalid = split_valid(df, ["close"])
    assert valid.count() == 3 and invalid.count() == 0


def test_unknown_asset_type_silently_dropped(spark):
    # reference: tests/test_data_processing.py:87-96
    df = _assets(
        spark,
        [("AAPL", "STOCK"), ("GOLD", "COMMODITY"), ("BTC", "CRYPTO")],
    )
    out = drop_unknown_asset_types(df, KNOWN_ASSET_TYPES)
    assert sorted(r.symbol for r in out.collect()) == ["AAPL", "BTC"]


def test_anti_join_symbols_needing_update(spark):
    # reference: etl/jobs/fetch_market_data/fetch_market_data.py:16-29
    requests = _assets(spark, [("A", "STOCK"), ("B", "STOCK"), ("C", "CRYPTO")])
    existing = spark.createDataFrame([("B",)], "symbol string")
    out = symbols_needing_update(requests, existing, ["symbol"])
    assert sorted(r.symbol for r in out.collect()) == ["A", "C"]


def test_coverage_short_circuit(spark):
    # reference: etl/jobs/fetch_market_index_data/fetch_market_index_data.py:161-165
    requests = spark.createDataFrame([("A",), ("B",)], "symbol string")
    existing = spark.createDataFrame([("A",), ("B",), ("Z",)], "symbol string")
    assert coverage_complete(requests, existing, ["symbol"])
    assert not coverage_complete(
        requests.union(spark.createDataFrame([("Q",)], "symbol string")),
        existing,
        ["symbol"],
    )


def test_month_spine_clamps_future_months(spark):
    # reference: etl/fetch_utils.py:195-196 — never request future months
    requests = _assets(spark, [("A", "STOCK")])
    spine = month_spine(
        requests, F.lit("2024-01-15"), F.lit("2024-12-31"), F.lit("2024-03-02")
    )
    months = sorted(r.month for r in spine.collect())
    assert months == [
        datetime.date(2024, 1, 1),
        datetime.date(2024, 2, 1),
        datetime.date(2024, 3, 1),
    ]


def test_gap_detection_patterns(spark):
    # coverage patterns from FIXTURES.md §6: interior gap + absent symbol
    requests = _assets(spark, [("A", "STOCK"), ("B", "STOCK")])
    spine = month_spine(
        requests, F.lit("2024-01-01"), F.lit("2024-03-01"), F.lit("2024-03-01")
    )
    existing = spark.createDataFrame(
        [
            ("A", datetime.date(2024, 1, 1)),
            ("A", datetime.date(2024, 3, 1)),
        ],
        "symbol string, date date",
    )
    missing = missing_months(spine, existing)
    got = sorted((r.symbol, str(r.month)) for r in missing.collect())
    assert got == [
        ("A", "2024-02-01"),
        ("B", "2024-01-01"),
        ("B", "2024-02-01"),
        ("B", "2024-03-01"),
    ]
    win = {
        r.symbol: (str(r.window_start), str(r.window_end), r.missing_months)
        for r in fetch_windows(missing).collect()
    }
    assert win["A"] == ("2024-02-01", "2024-02-01", 1)
    assert win["B"] == ("2024-01-01", "2024-03-01", 3)


def test_upsert_updates_win_ties_deterministically(spark):
    # SURVEY.md §7 watch-out (a): explicit tie-break, never partition order
    ts = datetime.datetime(2024, 1, 1)
    current = spark.createDataFrame(
        [("A", 1.0, ts), ("B", 2.0, ts)], "symbol string, price double, updated_at timestamp"
    )
    updates = spark.createDataFrame(
        [("A", 9.0, ts)], "symbol string, price double, updated_at timestamp"
    )
    out = upsert_last_write_wins(
        current, updates, ["symbol"], [F.col("updated_at").desc()]
    )
    got = {r.symbol: r.price for r in out.collect()}
    assert got == {"A": 9.0, "B": 2.0}


def test_upsert_newer_timestamp_wins(spark):
    t0, t1 = datetime.datetime(2024, 1, 1), datetime.datetime(2024, 1, 2)
    current = spark.createDataFrame(
        [("A", 1.0, t1)], "symbol string, price double, updated_at timestamp"
    )
    updates = spark.createDataFrame(
        [("A", 9.0, t0)], "symbol string, price double, updated_at timestamp"
    )
    out = upsert_last_write_wins(
        current, updates, ["symbol"], [F.col("updated_at").desc()]
    )
    assert out.first().price == 1.0  # current is newer; update does not clobber


def test_salted_aggregation_equals_plain(spark):
    """Two-phase salted aggregation must be a semantic no-op vs the
    plain groupBy — only the shuffle layout differs. NULL keys
    included (round-9 ADVICE medium symmetry): both phases are
    groupBys, and groupBy keeps NULL as one ordinary group, so —
    unlike the pre-fix salted_window_count join-back — no row can be
    dropped; this pins that."""
    from pyspark.sql import functions as F

    from financial_tracker_etl_spark.operators.skew import (
        salted_agg,
        salted_count,
    )

    # one hot key ('hot' = 80% of rows) + a long tail + a NULL group
    rows = (
        [("hot", i, float(i % 7)) for i in range(400)]
        + [(f"k{i % 20}", i, float(i)) for i in range(100)]
        + [(None, 1000 + i, float(i)) for i in range(5)]
    )
    df = spark.createDataFrame(rows, "k string, seq int, x double")

    plain = {(r["k"], r["count"]) for r in df.groupBy("k").count().collect()}
    salted = {
        (r["k"], r["count"])
        for r in salted_count(df, ["k"], salt_from=["seq"]).collect()
    }
    assert salted == plain

    plain2 = {
        (r["k"], r["n"], r["mx"])
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.max("x").alias("mx"))
        .collect()
    }
    salted2 = {
        (r["k"], r["n"], r["mx"])
        for r in salted_agg(
            df,
            ["k"],
            salt_from=["seq"],
            aggs={
                "n": (F.count(F.lit(1)), F.sum("n")),
                "mx": (F.max("x"), F.max("mx")),
            },
        ).collect()
    }
    assert salted2 == plain2


def test_asof_join_inclusive_and_null_before_first_quote(spark):
    import datetime as dt

    from financial_tracker_etl_spark.operators.asof import asof_join

    t = lambda d: dt.datetime(2024, 1, d)  # noqa: E731
    quotes = spark.createDataFrame(
        [("A", t(2), 10.0), ("A", t(5), 20.0), ("B", t(9), 5.0)],
        "symbol string, ts timestamp, price double",
    )
    trades = spark.createDataFrame(
        [(1, "A", t(1)), (2, "A", t(2)), (3, "A", t(7)), (4, "B", t(8))],
        "trade_id int, symbol string, trade_ts timestamp",
    )
    out = asof_join(
        trades, quotes, ["symbol"], "trade_ts", "ts", ["price"]
    )
    got = {r["trade_id"]: r["price"] for r in out.collect()}
    # before first quote -> NULL; equal ts -> inclusive; latest carried
    assert got == {1: None, 2: 10.0, 3: 20.0, 4: None}


def test_asof_join_duplicate_ts_uses_seq_tiebreak(spark):
    import datetime as dt

    from financial_tracker_etl_spark.operators.asof import asof_join

    ts = dt.datetime(2024, 1, 2)
    quotes = spark.createDataFrame(
        [("A", ts, 10.0, 1), ("A", ts, 99.0, 2)],
        "symbol string, ts timestamp, price double, qid long",
    )
    trades = spark.createDataFrame(
        [(1, "A", dt.datetime(2024, 1, 3))],
        "trade_id int, symbol string, trade_ts timestamp",
    )
    out = asof_join(
        trades, quotes, ["symbol"], "trade_ts", "ts", ["price"], right_seq="qid"
    )
    assert out.first()["price"] == 99.0  # max qid wins deterministically


def test_snapshot_diff_classifies_all_change_types(spark):
    from financial_tracker_etl_spark.operators.cdc import snapshot_diff

    old = spark.createDataFrame(
        [("A", 1.0), ("B", 2.0), ("C", 3.0)], "k string, v double"
    )
    new = spark.createDataFrame(
        [("A", 1.0), ("B", 9.0), ("D", 4.0)], "k string, v double"
    )
    got = {r["k"]: r["change_type"] for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got == {
        "A": "unchanged",
        "B": "updated",
        "C": "deleted",
        "D": "inserted",
    }
    # null-safe value compare: NULL == NULL is unchanged, NULL vs value is updated
    old2 = spark.createDataFrame([("A", None), ("B", None)], "k string, v double")
    new2 = spark.createDataFrame([("A", None), ("B", 1.0)], "k string, v double")
    got2 = {r["k"]: r["change_type"] for r in snapshot_diff(old2, new2, ["k"]).collect()}
    assert got2 == {"A": "unchanged", "B": "updated"}


def test_catalog_loads_every_table_with_key_columns(spark):
    from financial_tracker_etl_spark.catalog import TABLES, load_table

    key_cols = {
        "region": "r_regionkey",
        "nation": "n_nationkey",
        "customer": "c_custkey",
        "supplier": "s_suppkey",
        "part": "p_partkey",
        "orders": "o_orderkey",
        "lineitem": "l_orderkey",
        "events": "event_id",
        "documents": "doc_id",
        "embeddings": "vec_id",
    }
    from conftest import SF_DIR

    for name in TABLES:
        df = load_table(spark, SF_DIR, name)
        assert key_cols[name] in df.columns, name
        if name == "events":
            assert "ts_us" in df.columns  # nanos normalization applied


def test_asof_join_null_values_and_multi_col_same_row(spark):
    """A right row with a legitimately-NULL value column IS the match
    (no fall-through to an older row), and with several value_cols all
    outputs come from the same matched right row — the struct-carry
    contract."""
    import datetime as dt

    from financial_tracker_etl_spark.operators.asof import asof_join

    t = lambda d: dt.datetime(2024, 1, d)  # noqa: E731
    quotes = spark.createDataFrame(
        [("A", t(2), 10.0, 100.0), ("A", t(5), None, 500.0)],
        "symbol string, ts timestamp, bid double, ask double",
    )
    trades = spark.createDataFrame(
        [(1, "A", t(3)), (2, "A", t(6))],
        "trade_id int, symbol string, trade_ts timestamp",
    )
    out = asof_join(
        trades, quotes, ["symbol"], "trade_ts", "ts", ["bid", "ask"]
    )
    got = {r["trade_id"]: (r["bid"], r["ask"]) for r in out.collect()}
    # trade 2 matches the t(5) quote: bid stays NULL (no mixing with
    # the older row), ask comes from the SAME row
    assert got == {1: (10.0, 100.0), 2: (None, 500.0)}


def test_funnel_stages_require_strict_ordering(spark):
    from financial_tracker_etl_spark.queries.analytics import _q_funnel

    # synthetic: user 1 does view->click->purchase in order (stage 3),
    # user 2 purchases BEFORE clicking (stage 2), user 3 only views,
    # user 4 clicks without ever viewing (not in the funnel at all)
    import pandas as pd

    rows = [
        (1, "view", 100), (1, "click", 200), (1, "purchase", 300),
        (2, "view", 100), (2, "purchase", 150), (2, "click", 200),
        (3, "view", 100),
        (4, "click", 100),
    ]
    df = spark.createDataFrame(
        [(i, u, t, us) for i, (u, t, us) in enumerate(rows)],
        "event_id long, user_id long, event_type string, ts_us long",
    )
    import financial_tracker_etl_spark.queries.analytics as qa
    from unittest import mock

    with mock.patch.object(qa, "load_table", lambda spark, sf, name: df):
        out = {r.user_id: r for r in _q_funnel(spark, "unused").collect()}
    assert out[1].stage_reached == 3
    assert out[2].stage_reached == 2  # purchase before click doesn't count
    assert out[3].stage_reached == 1
    assert 4 not in out  # never viewed -> not in funnel


def test_weekly_retention_buckets_are_integer_weeks(spark):
    from financial_tracker_etl_spark.queries.analytics import _q_retention, _DAY_US
    import financial_tracker_etl_spark.queries.analytics as qa
    from unittest import mock

    # user 10 first active week 0, returns week 2; user 11 only week 1
    df = spark.createDataFrame(
        [
            (1, 10, 0 * _DAY_US),
            (2, 10, 15 * _DAY_US),
            (3, 11, 8 * _DAY_US),
        ],
        "event_id long, user_id long, ts_us long",
    )
    with mock.patch.object(qa, "load_table", lambda spark, sf, name: df):
        got = {
            (r.cohort_week, r.week_offset): r.n_users
            for r in _q_retention(spark, "unused").collect()
        }
    assert got == {(0, 0): 1, (0, 2): 1, (1, 0): 1}


def test_catalog_contract_under_vanilla_session(spark):
    """Environment-contract guard (round-2 postmortem): the driver runs
    queries under ITS OWN SparkSession, not ours — the catalog must not
    depend on any conf set at session-build time. ``newSession()`` gives
    a session whose runtime confs reset to build-time defaults, so any
    reliance on a runtime ``spark.conf.set`` (like round 2's dead
    nanosAsLong pin) surfaces here. Asserts dtype AND epoch-us value
    range — the range check is what catches a silent 1000x unit error."""
    from financial_tracker_etl_spark.catalog import TABLES, load_table
    from conftest import SF_DIR
    from pyspark.sql import functions as F

    vanilla = spark.newSession()
    ev = load_table(vanilla, SF_DIR, "events")
    assert dict(ev.dtypes)["ts_us"] == "bigint"
    lo, hi = ev.agg(F.min("ts_us"), F.max("ts_us")).first()
    # testdata events span 2024+; any ns/ms/s unit slip moves this by 1000x
    assert 1_500_000_000_000_000 < lo <= hi < 2_500_000_000_000_000, (lo, hi)
    key_dtypes = {
        "orders": ("o_orderkey", "bigint"),
        "lineitem": ("l_quantity", "double"),
        "documents": ("doc_id", "bigint"),
        "embeddings": ("vec_id", "bigint"),
    }
    for name in TABLES:
        df = load_table(vanilla, SF_DIR, name)
        assert df.count() > 0, name
        if name in key_dtypes:
            col, want = key_dtypes[name]
            assert dict(df.dtypes)[col] == want, (name, col, dict(df.dtypes)[col])


def test_events_stream_ts_matches_batch(spark):
    """The streaming events source must produce the identical ts_us the
    batch catalog does, whatever dtype the parquet resolves to (the
    round-2 silent-wrong failure mode: stream schema hardcoded longs)."""
    from financial_tracker_etl_spark.catalog import load_table
    from financial_tracker_etl_spark.streaming.windows import events_stream
    from conftest import SF_DIR

    batch = load_table(spark, SF_DIR, "events").select("event_id", "ts_us")
    stream = events_stream(spark, SF_DIR)
    assert dict(stream.dtypes)["ts_us"] == "bigint"
    assert dict(stream.dtypes)["event_time"].startswith("timestamp")


def test_table_diff_localizes_planted_changes(spark):
    """Identical snapshots produce an EMPTY diff; a single changed row
    and a single inserted row surface exactly their key's bucket (with
    count equality for the value change, count drift for the insert)."""
    from pyspark.sql import functions as F

    from financial_tracker_etl_spark.operators.reconcile import (
        _md5_int60,
        bucket_digests,
        digest_diff,
    )

    rows = [(f"SYM{i}", "STOCK", float(i)) for i in range(200)]
    a = spark.createDataFrame(rows, "symbol string, asset_type string, v double")
    payload = F.col("v").cast("long").cast("string")
    da = bucket_digests(a, ["symbol", "asset_type"], payload)
    assert digest_diff(da, da).count() == 0

    b = spark.createDataFrame(
        rows[:50] + [("SYM50", "STOCK", 9999.0)] + rows[51:] + [("NEW", "STOCK", 1.0)],
        "symbol string, asset_type string, v double",
    )
    db = bucket_digests(b, ["symbol", "asset_type"], payload)
    diff = {r.bucket: r for r in digest_diff(da, db).collect()}
    changed_bucket = a.select(
        (_md5_int60(F.concat_ws("|", F.lit("SYM50"), F.lit("STOCK"))) % 64)
    ).first()[0]
    new_bucket = a.select(
        (_md5_int60(F.concat_ws("|", F.lit("NEW"), F.lit("STOCK"))) % 64)
    ).first()[0]
    assert set(diff) == {changed_bucket, new_bucket} or (
        changed_bucket == new_bucket and set(diff) == {changed_bucket}
    )
    assert not diff[changed_bucket].digest_match
    assert diff[new_bucket].n_new >= diff[new_bucket].n_old


def test_histogram_quantiles_within_bin_width_of_exact(spark):
    """The 1000-bin sketch estimate must land within one bin width of
    the exact percentile (the sketch's error bound)."""
    from pyspark.sql import functions as F

    from financial_tracker_etl_spark.queries.analytics import _q_hist_quantiles
    from conftest import SF_DIR
    from financial_tracker_etl_spark.catalog import load_table

    li = load_table(spark, SF_DIR, "lineitem")
    mn, mx = li.agg(F.min("l_extendedprice"), F.max("l_extendedprice")).first()
    bin_w = (mx - mn) / 1000.0
    exact = {
        r.l_returnflag: (r.p50, r.p95)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.percentile("l_extendedprice", F.lit(0.5)).alias("p50"),
            F.percentile("l_extendedprice", F.lit(0.95)).alias("p95"),
        )
        .collect()
    }
    for r in _q_hist_quantiles(spark, SF_DIR).collect():
        e50, e95 = exact[r.l_returnflag]
        assert abs(r.p50_est - e50) <= bin_w * 1.5, (r.l_returnflag, r.p50_est, e50)
        assert abs(r.p95_est - e95) <= bin_w * 1.5, (r.l_returnflag, r.p95_est, e95)


def test_ivm_delta_algebra_handles_insert_update_delete(spark):
    """The maintained aggregate must equal the direct aggregate of the
    new snapshot under all three change classes — including deletes,
    which the corpus upsert never produces but the retraction algebra
    must still get right (dn=-1, dp=-old)."""
    from unittest import mock

    from pyspark.sql import functions as F
    import financial_tracker_etl_spark.queries.core as qc

    old_rows = [("A", "STOCK", 10.0), ("B", "STOCK", 20.0), ("C", "CRYPTO", 5.0)]
    new_rows = [("A", "STOCK", 15.0), ("C", "CRYPTO", 5.0), ("D", "FOREX", 7.0)]
    # B deleted, A updated, D inserted, C unchanged
    old = spark.createDataFrame(
        old_rows, "symbol string, asset_type string, price double"
    )
    new = spark.createDataFrame(
        new_rows, "symbol string, asset_type string, price double"
    )
    with mock.patch.object(
        qc.fixtures, "market_data", lambda _df: old
    ), mock.patch.object(qc, "_q_upsert", lambda s, d: new), mock.patch.object(
        qc, "load_table", lambda s, d, n: old
    ):
        got = {
            r.asset_type: (r.n_rows, r.total_price)
            for r in qc._q_ivm(spark, "unused").collect()
        }
    direct = {
        r.asset_type: (r.n, r.t)
        for r in new.groupBy("asset_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("price").alias("t"))
        .collect()
    }
    assert set(got) == set(direct)
    for k in direct:
        assert got[k][0] == direct[k][0], k
        assert abs(got[k][1] - direct[k][1]) < 1e-9, k


def test_zorder_buckets_bound_both_dimensions(spark):
    """Data-skipping property: every z-bucket's min/max envelope must be
    much narrower than the full domain in BOTH interleaved dimensions —
    that narrowness is exactly what lets a filter on either key prune
    buckets."""
    from financial_tracker_etl_spark.queries.analytics import _q_zorder
    from conftest import SF_DIR

    rows = _q_zorder(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # the top 8 z-bits pin 4 high bits of EACH dim, so both
        # envelopes are bounded by 2^12 = 4096 of the 65536 domain
        assert r.max_order_lo16 - r.min_order_lo16 <= 4096, r
        assert r.max_part_lo16 - r.min_part_lo16 <= 4096, r


def test_new_round3_queries_run_under_vanilla_session(spark):
    """Same environment-contract guard, swept over the round-3
    scale-pattern additions: each must execute and return rows under a
    fresh ``newSession()`` (build-time conf defaults — the driver's
    world). Catches any new query that quietly depends on a conf or
    session state our own session happens to carry."""
    from conftest import SF_DIR

    from financial_tracker_etl_spark.queries import registry

    vanilla = spark.newSession()
    reg = registry()
    for name in [
        "skew_safe_count_distinct",
        "binned_range_join",
        "hierarchical_time_rollup",
        "bloom_pruned_anti_join",
        "bucketed_colocated_join",
        "curriculum_difficulty_buckets",
        "rolling_week_user_activity",
        "unpivot_market_measures",
        "hll_shard_merge",
        "stream_sliding_window_counts",
    ]:
        assert reg[name].fn(vanilla, SF_DIR).count() > 0, name


def test_events_query_end_to_end_under_vanilla_session(spark):
    """Round-2's bug passed catalog-level checks in OUR session and
    still broke every events query under the driver's. Run a full
    events query (rollup: group, window, count) under newSession and
    pin a value-level invariant, so the whole path — read, normalize,
    aggregate — is proven conf-independent."""
    from conftest import SF_DIR

    from financial_tracker_etl_spark.queries import registry

    vanilla = spark.newSession()
    spec = registry()["events_hourly_rollup"]
    ours = {tuple(r) for r in spec.fn(spark, SF_DIR).collect()}
    theirs = {tuple(r) for r in spec.fn(vanilla, SF_DIR).collect()}
    assert ours == theirs
    assert ours  # nonempty


def test_profile_reports_runtime_metrics(spark):
    """The profiler must execute the query's OWN queryExecution and
    surface real SQLMetrics: the parquet scan reports its actual row
    count, a filter prunes below it, and the metrics come from the
    final adaptive plan (post-AQE), not the pre-execution shape."""
    from conftest import SF_DIR

    from financial_tracker_etl_spark.profile import (
        collect_metrics,
        format_profile,
    )
    from financial_tracker_etl_spark.queries import registry

    df = registry()["pricing_summary"].fn(spark, SF_DIR)
    rows = collect_metrics(df)
    by_name = {}
    for r in rows:
        by_name.setdefault(r.name.strip(), r.metrics)
    scan = next(m for n, m in by_name.items() if n.startswith("Scan parquet"))
    assert scan["numOutputRows"] > 0
    assert scan["numFiles"] >= 1
    flt = by_name["Filter"]
    assert 0 < flt["numOutputRows"] < scan["numOutputRows"]
    text = format_profile(rows)
    assert "Scan parquet" in text and "numOutputRows=" in text


def test_quarantine_split_tags_failed_rules(spark):
    """Row-level companion to the expectations report: rows failing
    ANY rule are quarantined with the exact failed-rule list; clean
    rows pass through unchanged; null-valued rule inputs count as
    failures (a null predicate is not a pass)."""
    from pyspark.sql import functions as F

    from financial_tracker_etl_spark.operators.expectations import (
        expectations_report,
        quarantine_split,
    )

    df = spark.createDataFrame(
        [
            ("a", 5, 1.0),
            ("b", 0, 2.0),     # qty rule fails
            ("c", 7, -1.0),    # price rule fails
            ("d", -1, None),   # both fail (null price is a failure)
        ],
        "id string, qty int, price double",
    )
    rules = {
        "qty_pos": F.col("qty") > 0,
        "price_pos": F.col("price") > 0,
    }
    clean, quarantined = quarantine_split(df, rules)
    got = {r.id: sorted(r._failed_rules) for r in quarantined.collect()}
    assert got == {
        "b": ["qty_pos"],
        "c": ["price_pos"],
        "d": ["price_pos", "qty_pos"],
    }
    assert sorted(r.id for r in clean.collect()) == ["a"]
    rep = {r.rule: (r.n_pass, r.n_fail) for r in expectations_report(df, rules).collect()}
    assert rep == {"qty_pos": (2, 2), "price_pos": (2, 2)}


def test_events_ts_normalization_bigint_nanos_branch(spark, tmp_path):
    """The OTHER environment shape: events.ts materialized as int64
    nanoseconds (what TIMESTAMP(NANOS) parquet resolves to under
    nanosAsLong-style readers). The catalog must branch on the loaded
    dtype and divide by 1000 — asserted against literal values, so both
    branches of events_ts_us_col have a pinned semantics test."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from financial_tracker_etl_spark.catalog import load_table

    ns = [1_700_000_000_000_000_123, 1_700_000_001_234_567_891]
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array(ns, pa.int64()),
            "user_id": pa.array([10, 20], pa.int64()),
            "event_type": pa.array(["a", "b"], pa.string()),
            "value": pa.array([1.0, 2.0], pa.float64()),
            "props": pa.array(["{}", "{}"], pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    ev = load_table(spark, str(tmp_path), "events")
    assert dict(ev.dtypes)["ts_us"] == "bigint"
    got = sorted(r.ts_us for r in ev.select("ts_us").collect())
    assert got == [n // 1000 for n in ns]


def test_bucket_digest_is_partition_layout_proof(spark):
    """The docstring claims the digest is order- and layout-independent
    (modular addition commutes); pin it: the same rows under wildly
    different partitionings — 1 partition, 40 hash partitions on a
    non-key column, round-robin — produce identical digest tables."""
    from pyspark.sql import functions as F

    from financial_tracker_etl_spark.operators.reconcile import (
        bucket_digests,
    )

    rows = [(f"SYM{i}", "STOCK", float(i % 97)) for i in range(500)]
    base = spark.createDataFrame(
        rows, "symbol string, asset_type string, v double"
    )
    payload = F.col("v").cast("long").cast("string")

    def digests(df):
        return sorted(
            map(
                tuple,
                bucket_digests(df, ["symbol", "asset_type"], payload).collect(),
            )
        )

    want = digests(base.coalesce(1))
    assert digests(base.repartition(40, "v")) == want
    assert digests(base.repartition(7)) == want


def test_connected_components_probe_cadence_is_result_invariant(spark):
    """probe_every trades convergence-probe jobs for idempotent
    overshoot rounds; the RESULT must not depend on it. A path graph
    (worst case: diameter rounds) under probe_every in {1, 2, 5} and a
    max_iter hitting the bound exactly all agree."""
    from financial_tracker_etl_spark.ext.cluster import connected_components

    n = 17
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc1 long, doc2 long"
    )
    want = {i: 0 for i in range(n)}
    for probe in (1, 2, 5):
        got = {
            r.node: r.cluster_id
            for r in connected_components(
                edges, max_iter=40, probe_every=probe
            ).collect()
        }
        assert got == want, probe


def test_asof_join_ignores_null_right_timestamps(spark):
    """A right row with a NULL timestamp can never prevail 'as of' any
    instant (DuckDB ASOF agrees): without the filter, NULLS-FIRST
    ordering would carry it as a phantom match for left rows that
    predate every real right row."""
    import datetime as dt

    from financial_tracker_etl_spark.operators.asof import asof_join

    t = lambda d: dt.datetime(2024, 1, d)  # noqa: E731
    quotes = spark.createDataFrame(
        [("A", None, 99.0), ("A", t(5), 20.0)],
        "symbol string, ts timestamp, price double",
    )
    trades = spark.createDataFrame(
        [(1, "A", t(1)), (2, "A", t(6))],
        "trade_id int, symbol string, trade_ts timestamp",
    )
    out = asof_join(trades, quotes, ["symbol"], "trade_ts", "ts", ["price"])
    got = {r["trade_id"]: r["price"] for r in out.collect()}
    # trade 1 predates every REAL quote -> NULL, never the NULL-ts row
    assert got == {1: None, 2: 20.0}


def test_missing_months_distinguishes_asset_types(spark):
    """Coverage stored under one asset_type must not mask a gap under
    another for the same (symbol, month): when the existing side
    carries asset_type, it participates in the anti-join (matching
    fetch_windows' (symbol, asset_type) grouping)."""
    requests = _assets(spark, [("A", "STOCK"), ("A", "CRYPTO")])
    spine = month_spine(
        requests, F.lit("2024-01-01"), F.lit("2024-02-01"), F.lit("2024-02-01")
    )
    existing = spark.createDataFrame(
        [("A", "CRYPTO", datetime.date(2024, 1, 1))],
        "symbol string, asset_type string, date date",
    )
    got = sorted(
        (r.symbol, r.asset_type, str(r.month))
        for r in missing_months(spine, existing).collect()
    )
    # CRYPTO Jan is covered; STOCK Jan is STILL missing
    assert got == [
        ("A", "CRYPTO", "2024-02-01"),
        ("A", "STOCK", "2024-01-01"),
        ("A", "STOCK", "2024-02-01"),
    ]
    # without asset_type on the existing side, the join stays
    # (symbol, month): Jan is covered for BOTH request rows
    untyped = existing.select("symbol", "date")
    got2 = sorted(
        (r.symbol, r.asset_type, str(r.month))
        for r in missing_months(spine, untyped).collect()
    )
    assert got2 == [
        ("A", "CRYPTO", "2024-02-01"),
        ("A", "STOCK", "2024-02-01"),
    ]


def test_expectations_report_empty_input_reports_zero_fail(spark):
    """Rules over an EMPTY relation (e.g. an already-clean quarantine
    subset) must report 0 pass / 0 fail / 0 ppm — not raise an ANSI
    divide-by-zero from the ppm denominator."""
    from financial_tracker_etl_spark.operators.expectations import (
        expectations_report,
    )

    df = spark.createDataFrame([], "id string, qty double")
    rules = {
        "qty_positive": F.col("qty") > 0,
        "id_present": F.col("id").isNotNull(),
    }
    rep = {
        r.rule: (r.n_pass, r.n_fail, int(r.fail_ppm))
        for r in expectations_report(df, rules).collect()
    }
    assert rep == {
        "qty_positive": (0, 0, 0),
        "id_present": (0, 0, 0),
    }


def test_salted_join_rejects_degenerate_salt_sources(spark):
    """salt_from that is a pure function of the join key ([], [key],
    [key, key]) silently defeats skew mitigation — the operator must
    refuse it; a genuinely varying salt source keeps the result equal
    to the plain join."""
    from financial_tracker_etl_spark.operators.joins import salted_join

    large = spark.createDataFrame(
        [("hot", i) for i in range(50)] + [("cold", 0)],
        "k string, seq int",
    )
    small = spark.createDataFrame(
        [("hot", 1.0), ("cold", 2.0)], "k string, v double"
    )
    for bad in (None, [], ["k"], ["k", "k"]):
        with pytest.raises(ValueError, match="salt_from"):
            salted_join(large, small, "k", salt_from=bad)
    got = sorted(
        (r.k, r.seq, r.v)
        for r in salted_join(large, small, "k", salt_from=["seq"]).collect()
    )
    want = sorted(
        (r.k, r.seq, r.v) for r in large.join(small, "k").collect()
    )
    assert got == want


def test_salted_window_count_equals_plain_window(spark):
    """salted_window_count must be a semantic no-op vs attaching the
    per-key count with a whole-partition window — same rows, same
    attached counts, for hot-key, tail-key, and NULL-key rows alike
    (round-9 skew probe's variant B promoted to a library helper;
    null keys are the round-9 ADVICE medium — the window groups NULLs
    together and keeps them, so the salted form must too)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from financial_tracker_etl_spark.operators.skew import salted_window_count

    rows = (
        [("hot", i) for i in range(400)]
        + [(f"k{i % 20}", 1000 + i) for i in range(100)]
        + [(None, 2000 + i) for i in range(7)]
    )
    df = spark.createDataFrame(rows, "k string, seq int")

    def _key(t):  # None-tolerant total order over (k, seq, n)
        return (t[0] is None, t[0] or "", t[1], t[2])

    plain = sorted(
        map(
            tuple,
            df.withColumn(
                "n", F.count(F.lit(1)).over(Window.partitionBy("k"))
            ).collect(),
        ),
        key=_key,
    )
    salted = sorted(
        map(
            tuple,
            salted_window_count(
                df, ["k"], salt_from=["seq"], buckets=8, out_col="n"
            ).collect(),
        ),
        key=_key,
    )
    assert salted == plain
    # deterministic across replays: identical result on a second run
    assert salted == sorted(
        map(
            tuple,
            salted_window_count(
                df, ["k"], salt_from=["seq"], buckets=8, out_col="n"
            ).collect(),
        ),
        key=_key,
    )


def test_quotes_typed_equals_string_cast_path(spark):
    """fixtures.quotes_typed is the arithmetic fast twin of the P4
    string pipeline (quotes_raw -> split_valid -> cast_measures): its
    rows must be BIT-identical, including which rows survive the
    valid filter (r17 optimization; proof in the fixture docstring —
    CAST('<n div 100>.<n%100>' AS DOUBLE) == n / 100.0 for the whole
    pmod-bounded domain, brute-force checked to 10.1e6)."""
    import math
    import os

    from financial_tracker_etl_spark import fixtures
    from financial_tracker_etl_spark.catalog import load_table
    from financial_tracker_etl_spark.queries.core import _typed_quotes

    sf_dir = os.environ.get(
        "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
    )
    slow = _typed_quotes(spark, sf_dir)
    fast = fixtures.quotes_typed(load_table(spark, sf_dir, "lineitem"))
    assert fast.columns == slow.columns
    assert fast.schema == slow.schema
    a = sorted(map(tuple, slow.collect()))
    b = sorted(map(tuple, fast.collect()))
    assert len(a) == len(b) and len(a) > 0
    for ra, rb in zip(a, b):
        for va, vb in zip(ra, rb):
            if isinstance(va, float):
                # bit-for-bit, not approx: the twin claim is exactness
                assert math.isnan(vb) if math.isnan(va) else va == vb, (ra, rb)
            else:
                assert va == vb, (ra, rb)
