"""Reference-parity queries (SURVEY.md §2.A–§2.I) with DuckDB oracles.

Every query here maps 1:1 to an operator row in SURVEY.md §2; the
oracle SQL re-derives the same fixtures via CTEs (fixtures.py keeps the
two derivations in sync).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .. import fixtures
from ..catalog import load_table
from ..operators.joins import existing_symbols, symbols_needing_update
from ..operators.upsert import upsert_last_write_wins
from ..operators.validation import (
    cast_measures,
    rename_project,
    split_valid,
)
from ..operators.windows import last_per_group, with_price_analytics
from ..plans import historical_repair as hr
from . import QuerySpec

# ---------------------------------------------------------------------------
# Shared oracle CTE fragments (flagship pipeline, SURVEY.md §3.2)
# ---------------------------------------------------------------------------

_REQUESTS_SQL = """
requests AS (
  SELECT * FROM assets_request WHERE asset_type IN ('STOCK', 'CRYPTO', 'FOREX')
)
"""

_EXISTING_SQL = f"""
existing AS (
  SELECT * FROM market_data_monthly
  WHERE date >= DATE '{hr.START}' AND date <= DATE '{hr.END}'
)
"""

_SPINE_SQL = f"""
spine AS (
  SELECT r.symbol, r.asset_type, CAST(gs.m AS DATE) AS month
  FROM requests r
  CROSS JOIN (
    SELECT unnest(generate_series(DATE '{hr.START}', DATE '{hr.END}',
                                  INTERVAL 1 MONTH)) AS m
  ) gs
)
"""

_MISSING_SQL = """
missing AS (
  SELECT s.symbol, s.asset_type, s.month
  FROM spine s
  LEFT JOIN (SELECT DISTINCT symbol, date FROM existing) e
    ON s.symbol = e.symbol AND s.month = e.date
  WHERE e.symbol IS NULL
)
"""

_FETCHED_SQL = """
fetched AS (
  SELECT symbol, asset_type, month AS date,
         CAST(CAST(substr(symbol, 4) AS BIGINT) * 10000
              + year(month) * 100 + month(month) AS DOUBLE) AS price
  FROM missing
)
"""

_FLAGSHIP_CTES = (
    fixtures.ASSETS_REQUEST_SQL,
    fixtures.MARKET_DATA_MONTHLY_SQL,
    _REQUESTS_SQL,
    _EXISTING_SQL,
    _SPINE_SQL,
    _MISSING_SQL,
)


# ---------------------------------------------------------------------------
# Flagship: historical gap repair (S5/J3/A2/F6-F8, reference §3.2)
# ---------------------------------------------------------------------------


def _q_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hr.repaired_table(spark, sf_dir)


_FLAGSHIP_ORACLE = (
    fixtures.with_ctes(*_FLAGSHIP_CTES, _FETCHED_SQL)
    + """
SELECT symbol, asset_type, date, price, FALSE AS backfilled FROM existing
UNION ALL
SELECT symbol, asset_type, date, price, TRUE AS backfilled FROM fetched
"""
)


def _q_missing_months(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hr.missing_months_df(spark, sf_dir)


_MISSING_ORACLE = (
    fixtures.with_ctes(*_FLAGSHIP_CTES)
    + "\nSELECT symbol, asset_type, month FROM missing"
)


def _q_fetch_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hr.fetch_windows_df(spark, sf_dir)


_WINDOWS_ORACLE = (
    fixtures.with_ctes(*_FLAGSHIP_CTES)
    + """
SELECT symbol, asset_type,
       min(month) AS window_start,
       max(month) AS window_end,
       count(*) AS missing_months
FROM missing
GROUP BY symbol, asset_type
"""
)


def _q_repair_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hr.repair_summary(spark, sf_dir)


_SUMMARY_ORACLE = (
    fixtures.with_ctes(*_FLAGSHIP_CTES, _FETCHED_SQL)
    + """
SELECT asset_type,
       count(*) AS total_rows,
       CAST(sum(CASE WHEN backfilled THEN 1 ELSE 0 END) AS BIGINT) AS backfilled_rows,
       count(DISTINCT symbol) AS symbols
FROM (
  SELECT symbol, asset_type, FALSE AS backfilled FROM existing
  UNION ALL
  SELECT symbol, asset_type, TRUE AS backfilled FROM fetched
)
GROUP BY asset_type
"""
)


# ---------------------------------------------------------------------------
# J1 / J2 / J4 — anti/semi join incrementality (reference core logic)
# ---------------------------------------------------------------------------


def _q_j1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 anti-join (reference:
    etl/jobs/fetch_market_data/fetch_market_data.py:16-29)."""
    requests = fixtures.assets_request(load_table(spark, sf_dir, "part"))
    existing = fixtures.market_data(load_table(spark, sf_dir, "lineitem"))
    return symbols_needing_update(requests, existing, ["symbol"])


_J1_ORACLE = (
    fixtures.with_ctes(fixtures.ASSETS_REQUEST_SQL, fixtures.MARKET_DATA_SQL)
    + """
SELECT r.symbol, r.asset_type
FROM assets_request r
LEFT JOIN (SELECT DISTINCT symbol FROM market_data) e ON r.symbol = e.symbol
WHERE e.symbol IS NULL
"""
)


def _q_j2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 semi-join (reference: etl/fetch_utils.py:118-150)."""
    requests = fixtures.assets_request(load_table(spark, sf_dir, "part"))
    state = fixtures.market_data(load_table(spark, sf_dir, "lineitem"))
    return existing_symbols(state, requests, ["symbol"])


_J2_ORACLE = (
    fixtures.with_ctes(fixtures.ASSETS_REQUEST_SQL, fixtures.MARKET_DATA_SQL)
    + """
SELECT m.*
FROM market_data m
WHERE m.symbol IN (SELECT symbol FROM assets_request)
"""
)


def _q_j4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 coverage counts (reference:
    etl/jobs/fetch_market_index_data/fetch_market_index_data.py:161-165).
    Single-row summary: requested / covered / missing."""
    supplier = load_table(spark, sf_dir, "supplier")
    requests = fixtures.index_symbols_request(supplier).distinct()
    state = fixtures.market_index_data(supplier).select("symbol").distinct()
    joined = requests.join(state.withColumn("_hit", F.lit(1)), "symbol", "left")
    return joined.agg(
        F.count(F.lit(1)).alias("requested"),
        F.count("_hit").alias("covered"),
        (F.count(F.lit(1)) - F.count("_hit")).alias("missing"),
    )


_J4_ORACLE = (
    fixtures.with_ctes(
        fixtures.INDEX_SYMBOLS_REQUEST_SQL, fixtures.MARKET_INDEX_DATA_SQL
    )
    + """
SELECT count(*) AS requested,
       count(e.symbol) AS covered,
       count(*) - count(e.symbol) AS missing
FROM (SELECT DISTINCT symbol FROM index_symbols_request) r
LEFT JOIN (SELECT DISTINCT symbol FROM market_index_data) e ON r.symbol = e.symbol
"""
)


# ---------------------------------------------------------------------------
# J5 — per-symbol coverage index (reference: etl/fetch_utils.py:152-180)
# ---------------------------------------------------------------------------


def _q_j5(spark: SparkSession, sf_dir: str) -> DataFrame:
    monthly = fixtures.market_data_monthly(load_table(spark, sf_dir, "lineitem"))
    return monthly.groupBy("symbol").agg(
        F.countDistinct("date").alias("n_months"),
        F.min("date").alias("first_month"),
        F.max("date").alias("last_month"),
    )


_J5_ORACLE = (
    fixtures.with_ctes(fixtures.MARKET_DATA_MONTHLY_SQL)
    + """
SELECT symbol,
       count(DISTINCT date) AS n_months,
       min(date) AS first_month,
       max(date) AS last_month
FROM market_data_monthly
GROUP BY symbol
"""
)


# ---------------------------------------------------------------------------
# P1 / P4 — validation + casts over string-typed quote payloads
# ---------------------------------------------------------------------------

_REQUIRED_QUOTE_FIELDS = ["close", "percent_change", "change", "high", "low"]


def _q_p1_invalid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 validation: rows failing the required-field check, tagged with
    the FIRST offending field (reference: etl/fetch_utils.py:30-43;
    message pinned by tests/test_data_processing.py:123-157)."""
    quotes = fixtures.quotes_raw(load_table(spark, sf_dir, "lineitem"))
    _, invalid = split_valid(quotes, _REQUIRED_QUOTE_FIELDS)
    return invalid.select("quote_id", "symbol", "error_field")


_P1_ORACLE = (
    fixtures.with_ctes(fixtures.QUOTES_RAW_SQL)
    + """
SELECT quote_id, symbol,
       CASE WHEN close IS NULL THEN 'close'
            WHEN percent_change IS NULL THEN 'percent_change'
            WHEN change IS NULL THEN 'change'
            WHEN high IS NULL THEN 'high'
            WHEN low IS NULL THEN 'low' END AS error_field
FROM quotes_raw
WHERE close IS NULL OR percent_change IS NULL OR change IS NULL
      OR high IS NULL OR low IS NULL
"""
)


def _typed_quotes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: valid rows with float() cast semantics + epoch->timestamp
    (reference: etl/jobs/fetch_market_data/fetch_market_data.py:50-55,
    F9/F10)."""
    quotes = fixtures.quotes_raw(load_table(spark, sf_dir, "lineitem"))
    valid, _ = split_valid(quotes, _REQUIRED_QUOTE_FIELDS)
    typed = cast_measures(
        valid,
        {f: "double" for f in _REQUIRED_QUOTE_FIELDS},
    )
    return typed.select(
        "quote_id",
        "symbol",
        "asset_type",
        F.col("close").alias("price"),
        "percent_change",
        "change",
        "high",
        "low",
        F.timestamp_seconds(F.col("timestamp")).cast("timestamp_ntz").alias(
            "updated_at"
        ),
    )


_TYPED_QUOTES_SQL_BODY = """
  SELECT quote_id, symbol, asset_type,
         CAST(close AS DOUBLE) AS price,
         CAST(percent_change AS DOUBLE) AS percent_change,
         CAST(change AS DOUBLE) AS change,
         CAST(high AS DOUBLE) AS high,
         CAST(low AS DOUBLE) AS low,
         -- to_seconds, not * INTERVAL 1 SECOND: DuckDB narrows the
         -- interval multiplicand to INT32, so a planted year-2200
         -- epoch (7,289,654,399 s — round-16 timewarp class) crashes
         -- the multiply; to_seconds takes the BIGINT whole
         TIMESTAMP '1970-01-01 00:00:00' + to_seconds("timestamp") AS updated_at
  FROM quotes_raw
  WHERE close IS NOT NULL AND percent_change IS NOT NULL AND change IS NOT NULL
        AND high IS NOT NULL AND low IS NOT NULL
"""

_P4_ORACLE = (
    fixtures.with_ctes(fixtures.QUOTES_RAW_SQL) + "\n" + _TYPED_QUOTES_SQL_BODY
)


# ---------------------------------------------------------------------------
# P2 — projection/rename of batch index quotes
# ---------------------------------------------------------------------------


def _q_p2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 rename (reference:
    etl/jobs/fetch_market_index_data/fetch_market_index_data.py:49-69).
    The raw side carries Yahoo-style regularMarket* names."""
    supplier = load_table(spark, sf_dir, "supplier")
    raw = supplier.select(
        fixtures.symbol_col("IDX", F.col("s_suppkey")).alias("symbol"),
        F.col("s_acctbal").alias("regularMarketPrice"),
        # guarded rounds, textually mirroring fixtures.market_index_data
        # (the oracle side): a planted 1.5e12 balance sits past the
        # band where the two engines' double rounds agree
        fixtures._r4(F.col("s_acctbal") / 100.0).alias("regularMarketChange"),
        fixtures._pct_round(F.col("s_acctbal") / 10000.0).alias(
            "regularMarketChangePercent"
        ),
        fixtures._r4(F.col("s_acctbal") * 1.01).alias("regularMarketDayHigh"),
        fixtures._r4(F.col("s_acctbal") * 0.99).alias("regularMarketDayLow"),
    )
    return rename_project(
        raw,
        {
            "symbol": "symbol",
            "regularMarketPrice": "price",
            "regularMarketChange": "price_change",
            "regularMarketChangePercent": "percent_change",
            "regularMarketDayHigh": "price_high",
            "regularMarketDayLow": "price_low",
        },
    )


_P2_ORACLE = (
    fixtures.with_ctes(fixtures.MARKET_INDEX_DATA_SQL)
    + """
SELECT symbol, price, price_change, percent_change, price_high, price_low
FROM market_index_data
"""
)


# ---------------------------------------------------------------------------
# S9-S11 — keyed last-write-wins upsert
# ---------------------------------------------------------------------------

_MD_COLS = [
    "symbol",
    "asset_type",
    "price",
    "change",
    "percent_change",
    "high",
    "low",
    "updated_at",
]


def _q_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9 upsert: merge typed quote updates into market_data, newest
    ``updated_at`` wins, updates win ties (reference ON CONFLICT DO
    UPDATE: etl/jobs/fetch_market_data/fetch_market_data.py:31-61;
    determinism per SURVEY.md §7 watch-out (a)).

    Single window pass: (updated_at DESC, _ver DESC) with _ver =
    quote_id for updates / -1 for current is a total order whose
    per-key max equals the two-stage dedupe-then-merge semantics —
    one shuffle + one WindowGroupLimit instead of two of each
    (.explain verified; the two-stage plan shuffled the same key
    twice)."""
    current = fixtures.market_data(load_table(spark, sf_dir, "lineitem"))
    # quotes_typed: bit-identical fast twin of _typed_quotes (see its
    # fixtures.py proof) — the string-build-then-parse path cost 1.4 s
    # of this query's 2.0 s at sf0.1 (r17 ledger)
    updates = fixtures.quotes_typed(
        load_table(spark, sf_dir, "lineitem")
    ).withColumnRenamed("quote_id", "_ver")
    merged = upsert_last_write_wins(
        current.select(*_MD_COLS).withColumn("_ver", F.lit(-1).cast("long")),
        updates.select(*_MD_COLS, "_ver"),
        keys=["symbol", "asset_type"],
        order_by=[F.col("updated_at").desc(), F.col("_ver").desc()],
    )
    return merged.drop("_ver")


_UPSERT_ORACLE = (
    fixtures.with_ctes(
        fixtures.MARKET_DATA_SQL,
        fixtures.QUOTES_RAW_SQL,
        "typed AS (" + _TYPED_QUOTES_SQL_BODY + ")",
        """
updates AS (
  SELECT symbol, asset_type, price, change, percent_change, high, low, updated_at
  FROM (
    SELECT *, row_number() OVER (PARTITION BY symbol, asset_type
                                 ORDER BY updated_at DESC, quote_id DESC) AS rn
    FROM typed
  ) WHERE rn = 1
)
""",
        """
unioned AS (
  SELECT symbol, asset_type, price, change, percent_change, high, low, updated_at,
         0 AS _src
  FROM market_data
  UNION ALL
  SELECT symbol, asset_type, price, change, percent_change, high, low, updated_at,
         1 AS _src
  FROM updates
)
""",
    )
    + """
SELECT symbol, asset_type, price, change, percent_change, high, low, updated_at
FROM (
  SELECT *, row_number() OVER (PARTITION BY symbol, asset_type
                               ORDER BY updated_at DESC, _src DESC) AS rn
  FROM unioned
) WHERE rn = 1
"""
)


# ---------------------------------------------------------------------------
# A4/O2 — latest row per symbol
# ---------------------------------------------------------------------------


def _q_a4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 last-per-group (reference ``api_data[-1]``:
    etl/jobs/fetch_historical_market_data/fetch_historical_market_data.py:50-61)."""
    monthly = fixtures.market_data_monthly(load_table(spark, sf_dir, "lineitem"))
    return last_per_group(monthly, ["symbol"], [F.col("date").desc()])


_A4_ORACLE = (
    fixtures.with_ctes(fixtures.MARKET_DATA_MONTHLY_SQL)
    + """
SELECT symbol, price, date, asset_type
FROM (
  SELECT *, row_number() OVER (PARTITION BY symbol ORDER BY date DESC) AS rn
  FROM market_data_monthly
) WHERE rn = 1
"""
)


# ---------------------------------------------------------------------------
# [DOC] indicators — lag / pct_change / SMA (reference README.md:339-346)
# ---------------------------------------------------------------------------


def _q_indicators(spark: SparkSession, sf_dir: str) -> DataFrame:
    # cluster_by_symbol: the window passes partition by symbol, so the
    # symbol-clustered aggregation shares ITS exchange with them — one
    # exchange total instead of two (guide §2.4; r17 ledger, plan diff
    # in plans/r17/doc_price_indicators_{before,after}.txt)
    monthly = fixtures.market_data_monthly(
        load_table(spark, sf_dir, "lineitem"), cluster_by_symbol=True
    )
    out = with_price_analytics(monthly)
    # rounding pins cross-engine float equality for the windowed means
    return out.select(
        "symbol",
        "date",
        "price",
        "prev_price",
        "price_change",
        # guarded: DuckDB's multiply-based round(x,6) perturbs the
        # double once |x| clears ~1e9 (a planted 1e-9 prev price puts
        # pct in the e15 range — round-16 fuzzer, extreme class)
        fixtures._pct_round(F.col("pct_change")).alias("pct_change"),
        # no rounding: the SMA is the floor-reconstructed exact decimal
        # sum / count (operators/windows.py), so the double quotient is
        # bit-identical cross-engine; round(…,4) at a .5 tie is NOT
        # (Spark HALF_UP vs DuckDB binary-value rounding)
        "sma_20",
        "sma_50",
        "running_max",
        "running_min",
    )


_INDICATORS_ORACLE = (
    fixtures.with_ctes(fixtures.MARKET_DATA_MONTHLY_SQL)
    + f"""
SELECT symbol, date, price,
       lag(price, 1) OVER w AS prev_price,
       price - lag(price, 1) OVER w AS price_change,
       {fixtures._pct_round_sql('''CASE WHEN lag(price, 1) OVER w IS NOT NULL
                   AND lag(price, 1) OVER w <> 0
                  THEN (price - lag(price, 1) OVER w) / lag(price, 1) OVER w * 100.0
             END''')} AS pct_change,
       CAST(CAST(floor(CAST(sum({fixtures.money_dec_sql("price")})
            OVER (PARTITION BY symbol ORDER BY date
                  ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
            AS DECIMAL(28,8)) * 10000) AS BIGINT)
            AS DOUBLE) / 10000.0
       / count(price) OVER (PARTITION BY symbol ORDER BY date
                            ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS sma_20,
       CAST(CAST(floor(CAST(sum({fixtures.money_dec_sql("price")})
            OVER (PARTITION BY symbol ORDER BY date
                  ROWS BETWEEN 49 PRECEDING AND CURRENT ROW)
            AS DECIMAL(28,8)) * 10000) AS BIGINT)
            AS DOUBLE) / 10000.0
       / count(price) OVER (PARTITION BY symbol ORDER BY date
                            ROWS BETWEEN 49 PRECEDING AND CURRENT ROW) AS sma_50,
       max(price) OVER (PARTITION BY symbol ORDER BY date
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_max,
       min(price) OVER (PARTITION BY symbol ORDER BY date
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_min
FROM market_data_monthly
WINDOW w AS (PARTITION BY symbol ORDER BY date)
"""
)


# ---------------------------------------------------------------------------
# S6 — asset-type fetch dispatcher (reference: etl/fetch_utils.py:6-27)
# ---------------------------------------------------------------------------


def _q_s6_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6: route each requested asset to its fetch strategy; unknown
    asset types are silently dropped (reference: etl/fetch_utils.py:24-27,
    pinned by tests/test_data_processing.py:87-96). Exercises F1
    (split "/") and F2 (concat "/") in the crypto/forex renderings
    (reference: etl/utils.py:190, etl/fetch_utils.py:20)."""
    requests = fixtures.assets_request(load_table(spark, sf_dir, "part"))
    pair = F.concat_ws("/", F.col("symbol"), F.lit("USD"))
    routed = requests.select(
        "symbol",
        "asset_type",
        F.when(F.col("asset_type") == "STOCK", "get_realtime_stock_data")
        .when(F.col("asset_type") == "CRYPTO", "get_realtime_crypto_data")
        .when(F.col("asset_type") == "FOREX", "get_realtime_forex_data")
        .alias("strategy"),
        F.when(F.col("asset_type") == "STOCK", F.col("symbol"))
        .otherwise(pair)
        .alias("fetch_symbol"),
        F.when(
            F.col("asset_type") == "FOREX", F.split(pair, "/").getItem(0)
        ).alias("from_symbol"),
        F.when(
            F.col("asset_type") == "FOREX", F.split(pair, "/").getItem(1)
        ).alias("to_symbol"),
    )
    return routed.filter(F.col("strategy").isNotNull())


_S6_ORACLE = (
    fixtures.with_ctes(fixtures.ASSETS_REQUEST_SQL)
    + """
SELECT symbol, asset_type,
       CASE asset_type WHEN 'STOCK' THEN 'get_realtime_stock_data'
                       WHEN 'CRYPTO' THEN 'get_realtime_crypto_data'
                       WHEN 'FOREX' THEN 'get_realtime_forex_data' END AS strategy,
       CASE WHEN asset_type = 'STOCK' THEN symbol
            ELSE concat(symbol, '/USD') END AS fetch_symbol,
       CASE WHEN asset_type = 'FOREX' THEN symbol END AS from_symbol,
       CASE WHEN asset_type = 'FOREX' THEN 'USD' END AS to_symbol
FROM assets_request
WHERE asset_type IN ('STOCK', 'CRYPTO', 'FOREX')
"""
)


# ---------------------------------------------------------------------------
# A1/A3/B1 — per-type batching with completion metadata
# ---------------------------------------------------------------------------


def _q_a1_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 group-by-type + B1 fixed-size batching (50/batch, the
    historical job's rate-limit bound) + A3 batch metadata (reference:
    fetch_historical_market_data.py:177-215; BATCHING_IMPLEMENTATION.md:30).
    Batch assignment is made deterministic by ordering on symbol —
    the reference's list order is its Python dict/list order."""
    from pyspark.sql import Window

    requests = fixtures.assets_request(load_table(spark, sf_dir, "part")).filter(
        F.col("asset_type").isin(*fixtures.KNOWN_ASSET_TYPES)
    )
    w = Window.partitionBy("asset_type").orderBy("symbol")
    batched = requests.withColumn(
        "batch_id", ((F.row_number().over(w) - 1) / 50).cast("int")
    )
    return batched.groupBy("asset_type", "batch_id").agg(
        F.count(F.lit(1)).alias("batch_size"),
        F.min("symbol").alias("first_symbol"),
        F.max("symbol").alias("last_symbol"),
    )


_A1_ORACLE = (
    fixtures.with_ctes(fixtures.ASSETS_REQUEST_SQL)
    + """
SELECT asset_type, batch_id,
       count(*) AS batch_size,
       min(symbol) AS first_symbol,
       max(symbol) AS last_symbol
FROM (
  SELECT symbol, asset_type,
         CAST((row_number() OVER (PARTITION BY asset_type ORDER BY symbol) - 1)
              // 50 AS INTEGER) AS batch_id
  FROM assets_request
  WHERE asset_type IN ('STOCK', 'CRYPTO', 'FOREX')
)
GROUP BY asset_type, batch_id
"""
)


# ---------------------------------------------------------------------------
# P3/P5 — payload envelope validation
# ---------------------------------------------------------------------------


def _q_p5_envelopes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 payload-envelope validation: reject corrupt JSON and missing
    required keys with a reason, first error wins (reference:
    fetch_market_data.py:70-81, fetch_historical_market_data.py:163-185;
    ValueError text pinned by tests). Envelopes are built, JSON-encoded,
    then re-parsed — the full F4 round-trip the Kafka path performs."""
    customer = load_table(spark, sf_dir, "customer")
    key = F.col("c_custkey")
    envelope = F.when(
        key % 13 == 0, F.concat(F.lit("{corrupt::"), key.cast("string"))
    ).otherwise(
        F.to_json(
            F.struct(
                F.array(fixtures.symbol_col("SYM", key)).alias("assets"),
                F.when(key % 7 != 0, F.lit("2024-01-01")).alias("start_date"),
                F.when(key % 11 != 0, F.lit("2024-06-01")).alias("end_date"),
            )
        )
    )
    raw = customer.select(key.alias("request_id"), envelope.alias("payload"))
    parsed = raw.select(
        "request_id",
        F.from_json(
            "payload",
            "assets array<string>, start_date string, end_date string",
        ).alias("r"),
    )
    return parsed.select(
        "request_id",
        F.when(F.col("r").isNull() | F.col("r.assets").isNull(), "corrupt_payload")
        .when(F.col("r.start_date").isNull(), "missing_start_date")
        .when(F.col("r.end_date").isNull(), "missing_end_date")
        .otherwise("ok")
        .alias("status"),
    )


_P5_ORACLE = """
SELECT c_custkey AS request_id,
       CASE WHEN c_custkey % 13 = 0 THEN 'corrupt_payload'
            WHEN c_custkey % 7 = 0 THEN 'missing_start_date'
            WHEN c_custkey % 11 = 0 THEN 'missing_end_date'
            ELSE 'ok' END AS status
FROM customer
"""


# ---------------------------------------------------------------------------
# CDC: change feed between pre- and post-upsert market_data snapshots
# ---------------------------------------------------------------------------


def _q_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """snapshot_diff(old_state, upserted_state): per (symbol,
    asset_type) change classification — the completion-event detail the
    reference's jobs report in aggregate (record counts) made
    row-level. price participates in the value comparison; updated_at
    is excluded so the class reflects data change, not write-stamps."""
    from ..operators.cdc import snapshot_diff

    old = fixtures.market_data(load_table(spark, sf_dir, "lineitem")).select(
        "symbol", "asset_type", "price", "high", "low"
    )
    new = _q_upsert(spark, sf_dir).select(
        "symbol", "asset_type", "price", "high", "low"
    )
    diff = snapshot_diff(old, new, ["symbol", "asset_type"])
    return diff.groupBy("change_type").agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.countDistinct("symbol").alias("n_symbols"),
    )


# old snapshot (market_data) + merged new snapshot — shared by the CDC
# classification and the bucket-digest reconciliation oracles
_SNAPSHOT_CTES = (
    fixtures.MARKET_DATA_SQL,
    fixtures.QUOTES_RAW_SQL,
    "typed AS (" + _TYPED_QUOTES_SQL_BODY + ")",
    """
updates AS (
  SELECT symbol, asset_type, price, change, percent_change, high, low, updated_at
  FROM (
    SELECT *, row_number() OVER (PARTITION BY symbol, asset_type
                                 ORDER BY updated_at DESC, quote_id DESC) AS rn
    FROM typed
  ) WHERE rn = 1
)
""",
    """
unioned AS (
  SELECT symbol, asset_type, price, high, low, updated_at, 0 AS _src
  FROM market_data
  UNION ALL
  SELECT symbol, asset_type, price, high, low, updated_at, 1 AS _src
  FROM updates
)
""",
    """
merged AS (
  SELECT symbol, asset_type, price, high, low
  FROM (
    SELECT *, row_number() OVER (PARTITION BY symbol, asset_type
                                 ORDER BY updated_at DESC, _src DESC) AS rn
    FROM unioned
  ) WHERE rn = 1
)
""",
)

_CDC_ORACLE = (
    fixtures.with_ctes(
        *_SNAPSHOT_CTES,
        """
diff AS (
  SELECT CASE WHEN o.symbol IS NULL THEN 'inserted'
              WHEN n.symbol IS NULL THEN 'deleted'
              WHEN o.price IS NOT DISTINCT FROM n.price
                   AND o.high IS NOT DISTINCT FROM n.high
                   AND o.low IS NOT DISTINCT FROM n.low THEN 'unchanged'
              ELSE 'updated' END AS change_type,
         coalesce(n.symbol, o.symbol) AS symbol
  FROM market_data o
  FULL OUTER JOIN merged n
    ON o.symbol = n.symbol AND o.asset_type = n.asset_type
)
""",
    )
    + """
SELECT change_type, count(*) AS n_keys, count(DISTINCT symbol) AS n_symbols
FROM diff
GROUP BY change_type
"""
)


def _q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The write side of CDC: ``apply_changes(old, snapshot_diff(old,
    new'), keys)`` must reproduce ``new'`` bit-for-bit, where ``new'``
    is the upserted state with a deterministic slice of keys REMOVED
    (symbols containing '3') so the feed carries real deletes, not just
    inserts/updates — the DELETE path the last-write-wins upsert can't
    express. The oracle states the target state directly; equality is
    the round-trip proof."""
    from ..operators.cdc import apply_changes, snapshot_diff

    cols = ["symbol", "asset_type", "price", "high", "low"]
    old = fixtures.market_data(load_table(spark, sf_dir, "lineitem")).select(*cols)
    new = (
        _q_upsert(spark, sf_dir)
        .select(*cols)
        .filter(~F.col("symbol").contains("3"))
    )
    diff = snapshot_diff(old, new, ["symbol", "asset_type"])
    return apply_changes(old, diff, ["symbol", "asset_type"])


_CDC_APPLY_ORACLE = (
    fixtures.with_ctes(*_SNAPSHOT_CTES)
    + """
SELECT symbol, asset_type, price, high, low
FROM merged
WHERE symbol NOT LIKE '%3%'
"""
)


def _q_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-digest reconciliation of the old vs upserted market
    state (operators/reconcile.py): Merkle-style anti-entropy — each
    snapshot reduces to 64 (count, digest) buckets and only
    disagreeing buckets surface. The row-level repair join would then
    touch ONLY those buckets, which is what makes snapshot comparison
    feasible at 100 TB."""
    from ..operators.reconcile import bucket_digests, digest_diff

    def payload(_df):
        return F.concat_ws(
            "|",
            *[
                F.round(F.col(c) * 10000).cast("long").cast("string")
                for c in ("price", "high", "low")
            ],
        )

    old = fixtures.market_data(load_table(spark, sf_dir, "lineitem")).select(
        "symbol", "asset_type", "price", "high", "low"
    )
    new = _q_upsert(spark, sf_dir).select(
        "symbol", "asset_type", "price", "high", "low"
    )
    da = bucket_digests(old, ["symbol", "asset_type"], payload(old))
    db = bucket_digests(new, ["symbol", "asset_type"], payload(new))
    return digest_diff(da, db)


def _q_ivm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance: the per-asset-type aggregate
    (count, exact DECIMAL price total) is MAINTAINED from the upsert's
    key-level deltas — base aggregate + Σ(new − old) per group — never
    recomputed from the new snapshot. At 100 TB this is the
    materialized-view economics: the delta join touches O(changed keys)
    while a rescan touches O(table). The DuckDB oracle computes the
    aggregate DIRECTLY from the merged snapshot, so a green row is a
    proof of maintenance ≡ recomputation (the IVM correctness
    condition), exact because the measures are DECIMAL.

    Same retraction algebra as Flink/Materialize deltas: an update
    contributes (new − old), an insert (new − 0); count contributions
    ±1; DECIMAL addition is associative so the fold order never
    matters."""
    # the portable (30,8) cast absorbs planted 1.5e12 extremes that
    # overflowed the old DECIMAL(18,8) under ANSI; the retraction
    # algebra runs on exact UNscaled decimals and the one ×10⁴ happens
    # at the end on the (28,8)-narrowed total, under Spark's
    # precision-38 cap (round-16 fuzzer, extreme class; see
    # analytics._dsum for the measured shape)
    _p = fixtures.money_dec(F.col("price")).alias("p")
    old = fixtures.market_data(load_table(spark, sf_dir, "lineitem")).select(
        "symbol", "asset_type", _p
    )
    new = _q_upsert(spark, sf_dir).select("symbol", "asset_type", _p)
    base = old.groupBy("asset_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("p").alias("s")
    )
    o = old.alias("o")
    nw = new.alias("n")
    delta = (
        o.join(
            nw,
            (F.col("o.symbol") == F.col("n.symbol"))
            & (F.col("o.asset_type") == F.col("n.asset_type")),
            "full_outer",
        )
        .select(
            F.coalesce(F.col("n.asset_type"), F.col("o.asset_type")).alias(
                "asset_type"
            ),
            (
                F.when(F.col("n.symbol").isNotNull(), 1).otherwise(0)
                - F.when(F.col("o.symbol").isNotNull(), 1).otherwise(0)
            ).alias("dn"),
            (
                F.coalesce(F.col("n.p"), F.lit(0).cast("decimal(30,8)"))
                - F.coalesce(F.col("o.p"), F.lit(0).cast("decimal(30,8)"))
            ).alias("dp"),
        )
        .groupBy("asset_type")
        .agg(F.sum("dn").alias("dn"), F.sum("dp").alias("dp"))
    )
    maintained = (
        base.join(delta, "asset_type", "full_outer")
        .select(
            "asset_type",
            (F.coalesce("n", F.lit(0)) + F.coalesce("dn", F.lit(0))).alias(
                "n_rows"
            ),
            (
                F.coalesce(F.col("s"), F.lit(0).cast("decimal(38,8)"))
                + F.coalesce(F.col("dp"), F.lit(0).cast("decimal(38,8)"))
            ).alias("_t"),
        )
        .filter(F.col("n_rows") > 0)
    )
    total = (
        F.floor(F.col("_t").cast("decimal(28,8)") * F.lit(10000))
        .cast("long")
        .cast("double")
        / 10000.0
    )
    return maintained.select(
        "asset_type", "n_rows", total.alias("total_price")
    )


_IVM_ORACLE = (
    fixtures.with_ctes(*_SNAPSHOT_CTES)
    + f"""
SELECT asset_type, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(CAST(floor(CAST(sum({fixtures.money_dec_sql("price")})
            AS DECIMAL(28,8)) * 10000) AS BIGINT)
            AS DOUBLE) / 10000.0 AS total_price
FROM merged
GROUP BY asset_type
"""
)


_DIGEST_SQL_BODY = """
  SELECT CAST(concat('0x', substr(md5(concat_ws('|', symbol, asset_type)),
                                  1, 15)) AS BIGINT) % 64 AS bucket,
         CAST(concat('0x', substr(md5(concat_ws('|', symbol, asset_type,
           CAST(CAST(round(price * 10000) AS BIGINT) AS VARCHAR),
           CAST(CAST(round(high * 10000) AS BIGINT) AS VARCHAR),
           CAST(CAST(round(low * 10000) AS BIGINT) AS VARCHAR))),
                                  1, 15)) AS BIGINT) % 2147483647 AS d
  FROM {src}
"""

_TABLE_DIFF_ORACLE = (
    fixtures.with_ctes(
        *_SNAPSHOT_CTES,
        "rowsa AS (" + _DIGEST_SQL_BODY.format(src="market_data") + ")",
        "rowsb AS (" + _DIGEST_SQL_BODY.format(src="merged") + ")",
        """
da AS (SELECT bucket, count(*) AS n_rows,
              CAST(CAST(sum(d) AS HUGEINT) % 2147483647 AS BIGINT) AS ds
       FROM rowsa GROUP BY bucket)
""",
        """
db AS (SELECT bucket, count(*) AS n_rows,
              CAST(CAST(sum(d) AS HUGEINT) % 2147483647 AS BIGINT) AS ds
       FROM rowsb GROUP BY bucket)
""",
    )
    + """
SELECT coalesce(a.bucket, b.bucket) AS bucket,
       CAST(coalesce(a.n_rows, 0) AS BIGINT) AS n_old,
       CAST(coalesce(b.n_rows, 0) AS BIGINT) AS n_new,
       coalesce(a.ds, -1) = coalesce(b.ds, -2) AS digest_match
FROM da a FULL OUTER JOIN db b ON a.bucket = b.bucket
WHERE coalesce(a.n_rows, 0) <> coalesce(b.n_rows, 0)
   OR NOT coalesce(a.ds, -1) = coalesce(b.ds, -2)
"""
)


# ---------------------------------------------------------------------------
# Python UDTF: lateral month-spine expansion (§2.J surface)
# ---------------------------------------------------------------------------


def _q_udtf_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fetch windows expanded to months via a LATERAL Python UDTF —
    proving the UDTF fan-out agrees exactly with the JVM
    sequence()+explode spine the hot path uses."""
    from ..functions.udtfs import register_udtfs

    register_udtfs(spark)
    hr.fetch_windows_df(spark, sf_dir).createOrReplaceTempView("_fw")
    return spark.sql(
        """
        SELECT f.symbol, f.asset_type, m.month
        FROM _fw f, LATERAL month_spine_udtf(f.window_start, f.window_end) m
        """
    )


_UDTF_SPINE_ORACLE = (
    fixtures.with_ctes(*_FLAGSHIP_CTES)
    + """
, fw AS (
  SELECT symbol, asset_type,
         min(month) AS window_start, max(month) AS window_end
  FROM missing
  GROUP BY symbol, asset_type
)
SELECT symbol, asset_type, CAST(gs.m AS DATE) AS month
FROM fw, LATERAL unnest(generate_series(window_start, window_end,
                                        INTERVAL 1 MONTH)) gs(m)
"""
)


# ---------------------------------------------------------------------------
# Grouped applyInPandas: longest missing-month streak per symbol
# ---------------------------------------------------------------------------


def _q_longest_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-symbol longest consecutive-missing-month run — the grouped
    ``applyInPandas`` surface (Arrow-batched) on integer-exact
    arithmetic so it oracle-checks. The relational twin is a
    lag-window; the pandas form is the shape custom per-group science
    code takes at scale.

    Grouping is by a COARSE hash bucket, not by symbol: with one
    pandas call per symbol the per-group Python dispatch dominated
    (10,000 two-hundred-row groups measured ~10 s at sf0.1 vs ~1.7 s
    bucketed). The scale rule for many-small-group pandas ops: group
    on a bucket of keys, vectorize the per-key logic inside the batch
    — same Arrow machinery, 64 dispatches instead of |keys|."""
    import pandas as pd

    monthly = fixtures.market_data_monthly(load_table(spark, sf_dir, "lineitem"))
    base = monthly.select(
        "symbol",
        (F.year("date") * 12 + F.month("date")).alias("mnum"),
    )

    def gap_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        d = pdf[["symbol", "mnum"]].drop_duplicates().sort_values(
            ["symbol", "mnum"]
        )
        gap = d["mnum"].diff() - 1
        gap[d["symbol"] != d["symbol"].shift()] = 0  # run starts: no gap
        agg = d.groupby("symbol", sort=False).agg(n_months=("mnum", "size"))
        agg["longest_gap_months"] = (
            gap.clip(lower=0).groupby(d["symbol"], sort=False).max().astype("int64")
        )
        return agg.reset_index()

    return (
        base.withColumn("_b", F.crc32(F.col("symbol")) % 64)
        .groupBy("_b")
        .applyInPandas(
            gap_fn, schema="symbol string, n_months long, longest_gap_months long"
        )
    )


_LONGEST_GAP_ORACLE = (
    fixtures.with_ctes(fixtures.MARKET_DATA_MONTHLY_SQL)
    + """
SELECT symbol,
       count(DISTINCT date) AS n_months,
       coalesce(max(gap), 0) AS longest_gap_months
FROM (
  SELECT symbol, date,
         (year(date) * 12 + month(date))
           - lag(year(date) * 12 + month(date))
             OVER (PARTITION BY symbol ORDER BY date) - 1 AS gap
  FROM (SELECT DISTINCT symbol, date FROM market_data_monthly)
)
GROUP BY symbol
"""
)


# ---------------------------------------------------------------------------
# Snapshot time travel: the quote traffic committed in 3 deterministic
# delta batches to a VersionedLogState, then read back AS OF version 1
# — the historical snapshot is reconstructed exactly (LWW fold over
# the first two immutable deltas), which is what the oracle states
# relationally. The Delta/Iceberg VERSION-AS-OF economics at 100 TB:
# history costs storage, never rewrites; audits/backfills read any
# past state without a restore.
# ---------------------------------------------------------------------------


def _q_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..streaming.state import VersionedLogState

    # bit-identical fast twin of _typed_quotes (fixtures.quotes_typed proof)
    typed = fixtures.quotes_typed(
        load_table(spark, sf_dir, "lineitem")
    ).withColumnRenamed("quote_id", "_ver")
    state = VersionedLogState(
        spark,
        tempfile.mkdtemp(prefix="ftes_timetravel_"),
        keys=["symbol", "asset_type"],
        version_cols=["updated_at", "_ver"],
    )
    for i in range(3):
        state.merge(typed.filter(F.col("_ver") % 3 == i))
    return state.read_as_of(1).drop("_ver")


_TIME_TRAVEL_ORACLE = (
    fixtures.with_ctes(
        fixtures.QUOTES_RAW_SQL,
        "typed AS (" + _TYPED_QUOTES_SQL_BODY + ")",
    )
    + """
SELECT symbol, asset_type, price, percent_change, change, high, low, updated_at
FROM (
  SELECT *, row_number() OVER (PARTITION BY symbol, asset_type
                               ORDER BY updated_at DESC, quote_id DESC) AS rn
  FROM typed WHERE quote_id % 3 < 2
) WHERE rn = 1
"""
)


# ---------------------------------------------------------------------------
# Cogrouped applyInPandas: per-symbol reconciliation of the incoming
# quote stream against the current state table — the cogroup surface
# (two grouped relations, one pandas frame PAIR per key, Arrow both
# ways) that per-key custom alignment code takes at scale. Keys
# missing on either side arrive as an empty frame (exercised: the
# state excludes partkey%3==0 symbols). Order-free exact arithmetic
# (counts, max, one subtraction) so it oracle-checks; the relational
# twin is a full-outer join of two grouped aggregates.
# ---------------------------------------------------------------------------


def _q_cogroup_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    # bit-identical fast twin of _typed_quotes (fixtures.quotes_typed proof)
    quotes = fixtures.quotes_typed(
        load_table(spark, sf_dir, "lineitem")
    ).select("symbol", "price")
    state = fixtures.market_data(load_table(spark, sf_dir, "lineitem")).select(
        "symbol", "price"
    )

    # Cogroup on a COARSE hash bucket of the symbol, not the symbol
    # itself: one pandas dispatch per symbol measured ~46 s for ~20k
    # symbols at sf0.1 vs ~2 s bucketed — the same many-small-groups
    # rule as longest_month_gap, on the two-sided surface. The per-key
    # reconcile (two grouped aggregates + full outer join) vectorizes
    # inside each bucket; NaN from a missing side serializes back
    # through Arrow as SQL NULL, matching the oracle's outer join.
    def reconcile(
        key: tuple, left: pd.DataFrame, right: pd.DataFrame
    ) -> pd.DataFrame:
        lq = left.groupby("symbol", sort=False)["price"].agg(
            n_quotes="size", max_quote_price="max"
        )
        rm = right.groupby("symbol", sort=False)["price"].agg(
            n_state_rows="size", state_price="max"
        )
        j = lq.join(rm, how="outer")
        j["n_quotes"] = j["n_quotes"].fillna(0).astype("int64")
        j["n_state_rows"] = j["n_state_rows"].fillna(0).astype("int64")
        j["price_drift"] = j["max_quote_price"] - j["state_price"]
        return j.reset_index()[
            [
                "symbol",
                "n_quotes",
                "n_state_rows",
                "max_quote_price",
                "state_price",
                "price_drift",
            ]
        ]

    bucket = lambda df: df.groupBy((F.crc32(F.col("symbol")) % 64).alias("_b"))  # noqa: E731
    return bucket(quotes).cogroup(bucket(state)).applyInPandas(
        reconcile,
        schema=(
            "symbol string, n_quotes long, n_state_rows long, "
            "max_quote_price double, state_price double, "
            "price_drift double"
        ),
    )


_COGROUP_RECONCILE_ORACLE = (
    fixtures.with_ctes(
        fixtures.QUOTES_RAW_SQL,
        "typed AS (" + _TYPED_QUOTES_SQL_BODY + ")",
        fixtures.MARKET_DATA_SQL,
    )
    + """
SELECT coalesce(q.symbol, m.symbol) AS symbol,
       coalesce(q.n_quotes, 0) AS n_quotes,
       coalesce(m.n_state_rows, 0) AS n_state_rows,
       q.max_quote_price,
       m.state_price,
       q.max_quote_price - m.state_price AS price_drift
FROM (
  SELECT symbol, count(*) AS n_quotes, max(price) AS max_quote_price
  FROM typed GROUP BY symbol
) q
FULL OUTER JOIN (
  SELECT symbol, count(*) AS n_state_rows, max(price) AS state_price
  FROM market_data GROUP BY symbol
) m ON q.symbol = m.symbol
"""
)


# ---------------------------------------------------------------------------
# GROUPED_AGG pandas UDAF: the remaining cell of the UDF surface matrix
# (scalar transform → built-ins; per-group frame → applyInPandas;
# two-sided group → cogroup; stateful stream → applyInPandasWithState;
# custom AGGREGATE → this). Exact median is the canonical aggregate the
# relational engine has no single built-in exact form for at scale.
# ---------------------------------------------------------------------------


def _q_udaf_value_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type exact median of ``value`` via a GROUPED_AGG
    ``pandas_udf`` (Arrow-batched custom aggregate), plus count and an
    integer-exact checksum lane. Determinism: pandas ``Series.median``
    and DuckDB ``median`` both average the two middle doubles for even
    counts — a single IEEE add+halve, bit-identical. Scale note: a
    GROUPED_AGG UDAF materializes each group's column in one worker's
    memory — fine for bounded per-group cardinality (5 event types
    here; the honest contract is group-size-bounded, same as any holistic
    aggregate), while the relational twin quantiles_by_returnflag shows
    the sort-based route when groups are huge."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _median_fn(v):
        return float(v.median())

    def _count_fn(v):
        return len(v)

    # real (non-string) annotations: this module runs under
    # ``from __future__ import annotations``, which would stringify an
    # inline signature and break pandas_udf's GROUPED_AGG inference.
    # Count is ALSO a pandas aggregate: Spark refuses to mix GROUPED_AGG
    # UDAFs with built-in aggregates in one agg() (one Arrow exchange
    # per group serves both).
    _median_fn.__annotations__ = {"v": pd.Series, "return": float}
    _count_fn.__annotations__ = {"v": pd.Series, "return": int}
    exact_median = pandas_udf(_median_fn, "double")
    group_count = pandas_udf(_count_fn, "long")

    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("value").isNotNull())
        .groupBy("event_type")
        .agg(
            group_count(F.col("value")).alias("n_values"),
            exact_median(F.col("value")).alias("median_value"),
        )
    )


_UDAF_MEDIAN_ORACLE = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_values,
       median(value) AS median_value
FROM events
WHERE value IS NOT NULL
GROUP BY event_type
"""


QUERIES: dict[str, QuerySpec] = {
    "state_time_travel": QuerySpec(_q_time_travel, _TIME_TRAVEL_ORACLE),
    "cogroup_state_reconciliation": QuerySpec(
        _q_cogroup_reconcile, _COGROUP_RECONCILE_ORACLE
    ),
    "flagship_historical_repair": QuerySpec(_q_flagship, _FLAGSHIP_ORACLE, bench=True),
    "historical_missing_months": QuerySpec(_q_missing_months, _MISSING_ORACLE),
    "historical_fetch_windows": QuerySpec(_q_fetch_windows, _WINDOWS_ORACLE),
    "historical_repair_summary": QuerySpec(_q_repair_summary, _SUMMARY_ORACLE),
    "j1_symbols_needing_update": QuerySpec(_q_j1, _J1_ORACLE, bench=True),
    "j2_existing_state_semi_join": QuerySpec(_q_j2, _J2_ORACLE),
    "j4_coverage_counts": QuerySpec(_q_j4, _J4_ORACLE),
    "j5_coverage_index": QuerySpec(_q_j5, _J5_ORACLE),
    "p1_invalid_quote_rows": QuerySpec(_q_p1_invalid, _P1_ORACLE),
    "p4_typed_quotes": QuerySpec(
        lambda spark, sf_dir: _typed_quotes(spark, sf_dir), _P4_ORACLE
    ),
    "p2_index_quote_projection": QuerySpec(_q_p2, _P2_ORACLE),
    "upsert_market_data": QuerySpec(_q_upsert, _UPSERT_ORACLE, bench=True),
    "a4_latest_monthly_price": QuerySpec(_q_a4, _A4_ORACLE),
    "doc_price_indicators": QuerySpec(_q_indicators, _INDICATORS_ORACLE, bench=True),
    "s6_asset_dispatch": QuerySpec(_q_s6_dispatch, _S6_ORACLE),
    "a1_historical_batches": QuerySpec(_q_a1_batches, _A1_ORACLE),
    "p5_payload_envelopes": QuerySpec(_q_p5_envelopes, _P5_ORACLE),
    "cdc_market_changes": QuerySpec(_q_cdc, _CDC_ORACLE),
    "cdc_apply_roundtrip": QuerySpec(
        _q_cdc_apply, _CDC_APPLY_ORACLE, bench_tail=True
    ),
    "table_diff_buckets": QuerySpec(_q_table_diff, _TABLE_DIFF_ORACLE),
    "ivm_maintained_agg": QuerySpec(_q_ivm, _IVM_ORACLE),
    "longest_month_gap": QuerySpec(_q_longest_gap, _LONGEST_GAP_ORACLE),
    "udaf_event_value_median": QuerySpec(
        _q_udaf_value_median, _UDAF_MEDIAN_ORACLE
    ),
    "udtf_month_spine": QuerySpec(_q_udtf_spine, _UDTF_SPINE_ORACLE),
}
