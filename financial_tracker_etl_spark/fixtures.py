"""Derived financial-domain fixtures over the driver testdata.

The reference's data model (market_data / market_index_data /
market_data_monthly keyed tables + request payloads — SURVEY.md §1.2,
reference: etl/jobs/fetch_market_data/fetch_market_data.py:36-56,
etl/jobs/fetch_market_index_data/fetch_market_index_data.py:79-98,
etl/jobs/fetch_historical_market_data/fetch_historical_market_data.py:92-103)
is re-derived deterministically from the TPC-H-ish testdata so every
operator can be differentially checked against DuckDB.

Each fixture exists twice, and the two MUST stay in sync:

- a DataFrame builder (Spark side, used by the engine), and
- a CTE snippet in :data:`FIXTURE_SQL` (DuckDB side, spliced into
  ``oracle_sql()`` strings).

Only cross-engine-deterministic expressions are used: integer modulo,
concat, min/max (never sum/avg of doubles over many rows), date_trunc,
single-value arithmetic. Aggregates that would depend on floating-point
accumulation order are avoided by construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# ---------------------------------------------------------------------------
# Cross-engine-portable money→DECIMAL conversion
# ---------------------------------------------------------------------------

# Below this bound (2^26), |v|·10^8 < 2^53, so DuckDB's multiply-based
# double→DECIMAL(·,8) cast is exact and agrees with Spark's
# exact-binary-expansion BigDecimal cast. Above it DuckDB's multiply
# rounds in double space (observed: CAST(9999999999.99 AS
# DECIMAL(30,8)) → ….98999936 in DuckDB vs ….98999977 in Spark —
# round-16 fuzzer, extreme-numeric class), so both engines switch to
# the SAME alternative: cast through the shortest-roundtrip string
# repr, which IEEE 754 makes identical on both sides. The branch
# constant and both branch bodies must stay textually mirrored between
# money_dec() and MONEY_DEC_SQL.
MONEY_DEC_BAND = 67108864.0  # 2^26


def money_dec(c: Column, typ: str = "decimal(30,8)") -> Column:
    return F.when(F.abs(c) < F.lit(MONEY_DEC_BAND), c.cast(typ)).otherwise(
        c.cast("string").cast(typ)
    )


def money_dec_sql(expr: str, typ: str = "DECIMAL(30,8)") -> str:
    return (
        f"(CASE WHEN abs({expr}) < 67108864.0 THEN CAST(({expr}) AS {typ}) "
        f"ELSE CAST(CAST(({expr}) AS VARCHAR) AS {typ}) END)"
    )


# Cross-engine d-decimal rounding is the EXPLICIT multiply form on
# BOTH engines: round(x·10^d)/10^d. Spark's native round(x, d) is
# BigDecimal-exact on the binary value while DuckDB's is
# multiply-based, and the two disagree whenever x·10^d rounds onto a
# representable .5 the exact expansion sits just under — a 1-ULP flip
# whose probability grows with ULP(x)/10^-d, observed INSIDE the old
# 1e9 band at x≈7.5e8 (round-16 fuzzer, fresh-seed gen: exact
# …330.4377 vs product double …330.5). The multiply form makes the
# result a pure function of the shared IEEE product: identical
# product double, identical half-away-from-zero integer round
# (BigDecimal HALF_UP == C round()), identical division. The band
# keeps huge magnitudes (where 10^-d is below one ULP anyway)
# emitting the raw double, and must stay textually mirrored between
# the Column and SQL twins.
_PCT_ROUND_BAND = 1e9


def _pct_round(c: Column) -> Column:
    return F.when(
        F.abs(c) < F.lit(_PCT_ROUND_BAND),
        F.round(c * F.lit(1000000.0), 0) / F.lit(1000000.0),
    ).otherwise(c)


def _pct_round_sql(expr: str) -> str:
    return (
        f"(CASE WHEN abs({expr}) < 1000000000.0 "
        f"THEN round(({expr}) * 1000000.0) / 1000000.0 "
        f"ELSE ({expr}) END)"
    )


# same contract at 4 decimals (a planted 1.5e12 s_acctbal sits
# outside the band and passes through raw)
_R4_BAND = 8e11


def _r4(c: Column) -> Column:
    return F.when(
        F.abs(c) < F.lit(_R4_BAND),
        F.round(c * F.lit(10000.0), 0) / F.lit(10000.0),
    ).otherwise(c)


def _r4_sql(expr: str) -> str:
    return (
        f"(CASE WHEN abs({expr}) < 800000000000.0 "
        f"THEN round(({expr}) * 10000.0) / 10000.0 "
        f"ELSE ({expr}) END)"
    )


# ---------------------------------------------------------------------------
# Shared derivation rules
# ---------------------------------------------------------------------------

# asset taxonomy dispatch (reference: etl/fetch_utils.py:6-27): key % 4
# COMMODITY is the deliberately-unknown type that must be dropped
# (reference: tests/test_data_processing.py:87-96).
ASSET_TYPES = ("STOCK", "CRYPTO", "FOREX", "COMMODITY")
KNOWN_ASSET_TYPES = ("STOCK", "CRYPTO", "FOREX")


def asset_type_col(key: Column) -> Column:
    m = key % 4
    return (
        F.when(m == 0, "STOCK")
        .when(m == 1, "CRYPTO")
        .when(m == 2, "FOREX")
        .otherwise("COMMODITY")
    )


def asset_type_sql(key: str) -> str:
    return (
        f"CASE WHEN {key} % 4 = 0 THEN 'STOCK' "
        f"WHEN {key} % 4 = 1 THEN 'CRYPTO' "
        f"WHEN {key} % 4 = 2 THEN 'FOREX' "
        f"ELSE 'COMMODITY' END"
    )


def symbol_col(prefix: str, key: Column) -> Column:
    return F.concat(F.lit(prefix), key.cast("string"))


# ---------------------------------------------------------------------------
# Spark-side builders
# ---------------------------------------------------------------------------


def assets_request(part: DataFrame) -> DataFrame:
    """Job request set {symbol, asset_type} (FIXTURES.md §3).

    Mirrors the ``assets`` list of a Kafka payload
    (reference: etl/jobs/fetch_market_data/fetch_market_data.py:70-77).
    """
    return part.select(
        symbol_col("SYM", F.col("p_partkey")).alias("symbol"),
        asset_type_col(F.col("p_partkey")).alias("asset_type"),
    )


def market_data(lineitem: DataFrame) -> DataFrame:
    """Realtime state table, key (symbol, asset_type) (FIXTURES.md §4).

    Partkeys divisible by 3 are deliberately absent so the anti-join
    (J1) has work to do. min/max aggregates only — deterministic across
    engines regardless of accumulation order.
    """
    return (
        lineitem.filter((F.col("l_partkey") % 3) != 0)
        .groupBy("l_partkey")
        .agg(
            F.max("l_extendedprice").alias("price"),
            F.max("l_extendedprice").alias("high"),
            F.min("l_extendedprice").alias("low"),
            F.max("l_shipdate").alias("updated_at"),
        )
        .select(
            symbol_col("SYM", F.col("l_partkey")).alias("symbol"),
            asset_type_col(F.col("l_partkey")).alias("asset_type"),
            "price",
            (F.col("high") - F.col("low")).alias("change"),
            # NULLIF base: a 0.0 low (zero prices are VALID, SURVEY §5)
            # makes percent-change undefined → NULL on both engines;
            # under ANSI the bare division THREW on one planted zero
            # (round-16 fuzzer, extreme class). Pristine fixtures have
            # strictly positive prices, so this is row-for-row
            # identical there.
            _pct_round(
                (F.col("high") - F.col("low"))
                / F.nullif(F.col("low"), F.lit(0.0))
                * 100.0
            ).alias("percent_change"),
            "high",
            "low",
            "updated_at",
        )
    )


MARKET_DATA_SQL = f"""
market_data AS (
  SELECT concat('SYM', l_partkey) AS symbol,
         {asset_type_sql('l_partkey')} AS asset_type,
         max(l_extendedprice) AS price,
         max(l_extendedprice) - min(l_extendedprice) AS change,
         {_pct_round_sql('(max(l_extendedprice) - min(l_extendedprice)) / NULLIF(min(l_extendedprice), 0.0) * 100.0')} AS percent_change,
         max(l_extendedprice) AS high,
         min(l_extendedprice) AS low,
         max(l_shipdate) AS updated_at
  FROM lineitem
  WHERE l_partkey % 3 <> 0
  GROUP BY l_partkey
)
"""

ASSETS_REQUEST_SQL = f"""
assets_request AS (
  SELECT concat('SYM', p_partkey) AS symbol,
         {asset_type_sql('p_partkey')} AS asset_type
  FROM part
)
"""


def market_data_monthly(
    lineitem: DataFrame, cluster_by_symbol: bool = False
) -> DataFrame:
    """Monthly time-series table, key (symbol, date, asset_type)
    (FIXTURES.md §6; reference:
    etl/jobs/fetch_historical_market_data/fetch_historical_market_data.py:92-103).

    Odd partkeys only, so roughly half the requested symbols are
    entirely absent and the rest have natural month gaps — the coverage
    patterns gap detection (J3) must handle.

    ``cluster_by_symbol=True`` produces the IDENTICAL rows (same
    groups — symbol is injective in partkey, asset_type is constant
    per symbol — same max), but plans the aggregation under
    symbol-only hash partitioning (explicit repartition before the
    groupBy; HashPartitioning(symbol) satisfies the grouping's
    ClusteredDistribution because it is a subset of the keys). A
    consumer that next windows/aggregates BY SYMBOL then needs NO
    second exchange — one shuffle total instead of two (guide §2.4
    "two operations keyed the same way share one exchange"). The
    default keeps the partial-aggregation shape for consumers keyed
    some other way. Trade-off, measured at sf0.1: rows per
    (partkey, month) group ≈ 1, so the default's map-side partial agg
    reduces almost nothing and its second exchange just re-moves the
    same ~300k rows (r17 ledger, doc_price_indicators)."""
    if cluster_by_symbol:
        pre = lineitem.filter((F.col("l_partkey") % 2) == 1).select(
            symbol_col("SYM", F.col("l_partkey")).alias("symbol"),
            F.trunc(F.col("l_shipdate").cast("date"), "month").alias("date"),
            asset_type_col(F.col("l_partkey")).alias("asset_type"),
            F.col("l_extendedprice"),
        )
        return (
            pre.repartition("symbol")
            .groupBy("symbol", "date", "asset_type")
            .agg(F.max("l_extendedprice").alias("price"))
            .select("symbol", "price", "date", "asset_type")
        )
    return (
        lineitem.filter((F.col("l_partkey") % 2) == 1)
        .groupBy(
            F.col("l_partkey"),
            F.trunc(F.col("l_shipdate").cast("date"), "month").alias("date"),
        )
        .agg(F.max("l_extendedprice").alias("price"))
        .select(
            symbol_col("SYM", F.col("l_partkey")).alias("symbol"),
            "price",
            "date",
            asset_type_col(F.col("l_partkey")).alias("asset_type"),
        )
    )


MARKET_DATA_MONTHLY_SQL = f"""
market_data_monthly AS (
  SELECT concat('SYM', l_partkey) AS symbol,
         max(l_extendedprice) AS price,
         CAST(date_trunc('month', l_shipdate) AS DATE) AS date,
         {asset_type_sql('l_partkey')} AS asset_type
  FROM lineitem
  WHERE l_partkey % 2 = 1
  GROUP BY l_partkey, CAST(date_trunc('month', l_shipdate) AS DATE)
)
"""


def market_index_data(supplier: DataFrame) -> DataFrame:
    """Index state table, key (symbol) (FIXTURES.md §5; reference:
    etl/jobs/fetch_market_index_data/fetch_market_index_data.py:79-98)."""
    bal = F.col("s_acctbal")
    return supplier.select(
        symbol_col("IDX", F.col("s_suppkey")).alias("symbol"),
        bal.alias("price"),
        # magnitude-guarded rounds: a planted 1.5e12 balance (extreme
        # fuzz class, SURVEY §5 huge-is-VALID) pushes |x|·10^d past
        # 2^53, where DuckDB's multiply-based round perturbs the
        # double while Spark's BigDecimal round is exact
        _r4(bal / 100.0).alias("price_change"),
        _pct_round(bal / 10000.0).alias("percent_change"),
        _r4(bal * 1.01).alias("price_high"),
        _r4(bal * 0.99).alias("price_low"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("updated_at"),
    )


MARKET_INDEX_DATA_SQL = f"""
market_index_data AS (
  SELECT concat('IDX', s_suppkey) AS symbol,
         s_acctbal AS price,
         {_r4_sql('s_acctbal / 100.0')} AS price_change,
         {_pct_round_sql('s_acctbal / 10000.0')} AS percent_change,
         {_r4_sql('s_acctbal * 1.01')} AS price_high,
         {_r4_sql('s_acctbal * 0.99')} AS price_low,
         TIMESTAMP '2024-01-01 00:00:00' AS updated_at
  FROM supplier
)
"""


def index_symbols_request(supplier: DataFrame) -> DataFrame:
    """Requested index symbols — a superset of what exists so the
    semi-join (J2) and coverage check (J4) are non-trivial.
    Suppkeys % 5 < 3 exist in market_index_data-request overlap terms;
    we also request IDX symbols beyond the supplier range.
    """
    extra = supplier.select(
        symbol_col("IDX", F.col("s_suppkey") + 1000000).alias("symbol")
    )
    base = supplier.filter((F.col("s_suppkey") % 5) < 3).select(
        symbol_col("IDX", F.col("s_suppkey")).alias("symbol")
    )
    return base.unionByName(extra)


INDEX_SYMBOLS_REQUEST_SQL = """
index_symbols_request AS (
  SELECT concat('IDX', s_suppkey) AS symbol FROM supplier WHERE s_suppkey % 5 < 3
  UNION ALL
  SELECT concat('IDX', s_suppkey + 1000000) AS symbol FROM supplier
)
"""


def quotes_raw(lineitem: DataFrame) -> DataFrame:
    """Realtime quote payload rows with *string-typed decimals*
    (FIXTURES.md §1; mirrors reference
    tests/test_utils/mock_responses.py:1-176 where the API returns
    "close": "204.60001"). Cast semantics (P4/F9) are under test, so
    measures are strings here. Every 37th partkey has a NULL close and
    every 41st a NULL percent_change to exercise the validation error
    path (reference: tests/test_data_processing.py:123-157).
    """
    li = lineitem.filter(F.col("l_linenumber") == 1)
    # measures are integer "cents" formatted as 2-decimal strings —
    # exact arithmetic, so Spark and DuckDB agree bit-for-bit (a
    # double->decimal cast would diverge at .xx5 rounding boundaries).
    # The derivations use pmod, so cents are NON-NEGATIVE for any key
    # (an orphaned negative FK drove `%` negative and the formatter
    # rendered '-6.-89' — round-16 orphans class; an API payload is
    # well-formed regardless of which key it dangles from). Keeping
    # the formatter this small matters: P1's required-field filter is
    # pushed through this projection and re-inlines every measure
    # string per null-check, and a fatter formatter (the first
    # sign-total CASE+abs fix) pushed the generated stage past the
    # JIT method limit — cdc/upsert walltime +40% (round-16 A/B).
    cents = lambda c: F.expr(  # noqa: E731
        f"concat(CAST(({c}) DIV 100 AS STRING), '.', "
        f"lpad(CAST(({c}) % 100 AS STRING), 2, '0'))"
    )
    close_c = "pmod(l_partkey * 9973 + l_orderkey * 7, 10000000)"
    pct_c = "pmod(l_partkey * 31 + l_orderkey, 10000)"
    chg_c = "pmod(l_orderkey * 17 + l_partkey, 100000)"
    high_c = f"({close_c}) + ({chg_c})"
    low_c = f"({close_c}) - (({chg_c}) % (({close_c}) + 1))"
    return li.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("quote_id"),
        symbol_col("SYM", F.col("l_partkey")).alias("symbol"),
        asset_type_col(F.col("l_partkey")).alias("asset_type"),
        F.when((F.col("l_partkey") % 37) != 0, cents(close_c)).alias("close"),
        F.when((F.col("l_partkey") % 41) != 0, cents(pct_c)).alias(
            "percent_change"
        ),
        cents(chg_c).alias("change"),
        cents(high_c).alias("high"),
        cents(low_c).alias("low"),
        F.unix_seconds(F.col("l_shipdate").cast("timestamp")).alias("timestamp"),
    )


def quotes_typed(lineitem: DataFrame) -> DataFrame:
    """Typed realtime quotes — the provably bit-identical FAST TWIN of
    ``quotes_raw → split_valid → cast_measures`` (the P4 pipeline),
    going straight from the integer cents to doubles without building
    the decimal strings.

    Equivalence (r17 optimization):

    - values: every measure is exactly ``n / 100.0`` for a pmod-bounded
      integer ``n`` (close < 1e7, pct < 1e4, chg < 1e5, high < 1.01e7,
      low in [0, 1e7)). ``CAST('<n div 100>.<n%100 zero-padded>' AS
      DOUBLE)`` and ``n / 100.0`` are both the correctly-rounded IEEE
      double of the exact rational n/100 (n < 2^53), hence the same
      bits — brute-force verified over the full reachable domain
      [0, 10.1e6], 0 mismatches, and pinned cross-engine by the
      unchanged oracles of every consumer plus
      tests/test_queries.py::test_quotes_typed_equals_string_cast_path.
    - rows: ``close IS NOT NULL`` ⟺ partkey/orderkey non-null AND
      partkey % 37 != 0 (the concat of non-null pmod parts is never
      null); likewise percent_change with % 41. change/high/low are
      null only on null keys. So the valid-row filter reduces to the
      cheap key predicate below.

    Why it exists: the string formatter is the fixture CONTRACT for the
    string-typed payload consumers (P1 validation, P5 envelopes, the
    streaming JSON traffic) and for P4, the query whose declared
    semantics ARE the cast — those keep ``quotes_raw``. But the P4
    filter is pushed below the projection and re-inlines every measure
    string per null-check, so each downstream consumer of the TYPED
    rows paid the 5-string build roughly twice per row plus the
    parse-back; measured 1.4 s of upsert_market_data's 2.0 s at sf0.1
    (r17 ledger)."""
    li = lineitem.filter(F.col("l_linenumber") == 1)
    close_c = "pmod(l_partkey * 9973 + l_orderkey * 7, 10000000)"
    pct_c = "pmod(l_partkey * 31 + l_orderkey, 10000)"
    chg_c = "pmod(l_orderkey * 17 + l_partkey, 100000)"
    high_c = f"({close_c}) + ({chg_c})"
    low_c = f"({close_c}) - (({chg_c}) % (({close_c}) + 1))"
    valid = li.filter(
        F.col("l_partkey").isNotNull()
        & F.col("l_orderkey").isNotNull()
        & ((F.col("l_partkey") % 37) != 0)
        & ((F.col("l_partkey") % 41) != 0)
    )
    return valid.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("quote_id"),
        symbol_col("SYM", F.col("l_partkey")).alias("symbol"),
        asset_type_col(F.col("l_partkey")).alias("asset_type"),
        F.expr(f"({close_c}) / 100.0D").alias("price"),
        F.expr(f"({pct_c}) / 100.0D").alias("percent_change"),
        F.expr(f"({chg_c}) / 100.0D").alias("change"),
        F.expr(f"({high_c}) / 100.0D").alias("high"),
        F.expr(f"({low_c}) / 100.0D").alias("low"),
        F.timestamp_seconds(
            F.unix_seconds(F.col("l_shipdate").cast("timestamp"))
        )
        .cast("timestamp_ntz")
        .alias("updated_at"),
    )


# pmod twins (DuckDB has no pmod; ((x % m) + m) % m — identical to
# Spark's pmod for m > 0, and a no-op vs plain % for the all-positive
# pristine keys)
_CLOSE_C = "((l_partkey * 9973 + l_orderkey * 7) % 10000000 + 10000000) % 10000000"
_PCT_C = "((l_partkey * 31 + l_orderkey) % 10000 + 10000) % 10000"
_CHG_C = "((l_orderkey * 17 + l_partkey) % 100000 + 100000) % 100000"
_HIGH_C = f"({_CLOSE_C}) + ({_CHG_C})"
_LOW_C = f"({_CLOSE_C}) - (({_CHG_C}) % (({_CLOSE_C}) + 1))"


def _cents_sql(c: str) -> str:
    # inputs are pmod-bounded non-negative (see quotes_raw.cents), so
    # the compact truncating form is total
    return (
        f"concat(CAST(({c}) // 100 AS VARCHAR), '.', "
        f"lpad(CAST(({c}) % 100 AS VARCHAR), 2, '0'))"
    )


QUOTES_RAW_SQL = f"""
quotes_raw AS (
  SELECT l_orderkey * 10 + l_linenumber AS quote_id,
         concat('SYM', l_partkey) AS symbol,
         {asset_type_sql('l_partkey')} AS asset_type,
         CASE WHEN l_partkey % 37 <> 0 THEN {_cents_sql(_CLOSE_C)} END AS close,
         CASE WHEN l_partkey % 41 <> 0 THEN {_cents_sql(_PCT_C)} END AS percent_change,
         {_cents_sql(_CHG_C)} AS change,
         {_cents_sql(_HIGH_C)} AS high,
         {_cents_sql(_LOW_C)} AS low,
         -- floor, not bare CAST: epoch() returns DOUBLE seconds, and a
         -- planted .999999-microsecond instant rounds UP across the
         -- second boundary under CAST while Spark's unix_seconds
         -- floor-divides the microsecond count (round-16 fuzzer,
         -- timewarp class: 23:59:59.999999 → :59 vs :00)
         CAST(floor(epoch(l_shipdate)) AS BIGINT) AS "timestamp"
  FROM lineitem
  WHERE l_linenumber = 1
)
"""


def with_ctes(*ctes: str) -> str:
    """Compose fixture CTE snippets into a WITH prefix for oracle SQL."""
    bodies = [c.strip() for c in ctes]
    return "WITH " + ",\n".join(bodies)
