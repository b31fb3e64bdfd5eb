"""Quote connectors as a first-class PySpark custom DataSource.

``spark.read.format("fintrack_quotes")`` turns the S1-S4 HTTP adapters
(sources/http_quotes.py; reference: etl/utils.py:75-366) into a native
source: the symbol universe is split into fixed-size batches (B1,
reference batch_size=100 — BATCHING_IMPLEMENTATION.md:11-36) and each
batch becomes ONE InputPartition, so fetches run executor-side in
parallel, one multi-symbol call per partition — never a driver loop.

Source-level filter pushdown (``pushFilters``): ``symbol = 'X'`` /
``symbol IN (...)`` predicates prune the symbol batches BEFORE any
fetch is issued — the reference's skip-fetch optimization (J1,
fetch_market_data.py:84-88) expressed where Spark wants it, in the
scan. Unsupported filters are handed back to Spark to evaluate.

Transport: ``fake`` (default here) produces deterministic synthetic
payloads with the same decimal-string shapes the reference's mock
fixtures pin (tests/test_utils/mock_responses.py:1-182 — string
decimals, epoch-second timestamps); ``http`` is the production slot
and deliberately unimplemented in this offline environment.

At 100 TB scale the same source shape holds: the symbol universe is a
DataFrame column, partition count tracks ``len(symbols)/batch_size``,
and rate-limit retry lives per partition (B2, RetryPolicy) — no
driver-side state at all.
"""

from __future__ import annotations

import zlib
from typing import Any, Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    In,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from .http_quotes import (
    get_realtime_crypto_data,
    get_realtime_forex_data,
    get_realtime_stock_data,
)

QUOTE_DDL = (
    "symbol string, asset_type string, close string, change string, "
    "percent_change string, high string, low string, ts long"
)

_EPOCH_ANCHOR = 1_704_067_200  # 2024-01-01T00:00:00Z, fixed for determinism


def fake_transport(url: str, params: dict[str, Any]) -> dict[str, Any]:
    """Deterministic synthetic quote payload for ``params['symbol']``
    (possibly a rendered pair like ``BTC/USD``): string-decimal fields
    exactly like the reference's captured fixtures. Pure function of
    the symbol — every executor, every run, same payload."""
    sym = params["symbol"]
    h = zlib.crc32(sym.encode("utf-8"))
    close = (h % 90_000) / 100.0 + 100.0
    change = ((h >> 8) % 2_000) / 100.0 - 10.0
    return {
        "symbol": sym,
        "close": f"{close:.5f}",
        "change": f"{change:.5f}",
        "percent_change": f"{change / close * 100.0:.5f}",
        "high": f"{close + abs(change):.5f}",
        "low": f"{close - abs(change):.5f}",
        "timestamp": _EPOCH_ANCHOR + h % 86_400,
        "is_market_open": bool(h % 2),
    }


class SymbolBatch(InputPartition):
    def __init__(self, symbols: list[str]) -> None:
        self.symbols = symbols


class QuoteBatchReader(DataSourceReader):
    def __init__(self, options: dict[str, str]) -> None:
        raw = options.get("symbols", "")
        self.symbols = [s.strip() for s in raw.split(",") if s.strip()]
        if not self.symbols:
            raise ValueError(
                "fintrack_quotes requires a comma-separated 'symbols' option"
            )
        self.asset_type = options.get("asset_type", "STOCK").upper()
        self.batch_size = int(options.get("batch_size", "100"))
        if options.get("transport", "fake") != "fake":
            raise NotImplementedError(
                "only the deterministic 'fake' transport exists in this "
                "offline environment; production wires an HTTP client here"
            )

    def pushFilters(self, filters):  # noqa: N802 (Spark API name)
        for f in filters:
            if isinstance(f, EqualTo) and tuple(f.attribute) == ("symbol",):
                self.symbols = [s for s in self.symbols if s == f.value]
            elif isinstance(f, In) and tuple(f.attribute) == ("symbol",):
                keep = set(f.value)
                self.symbols = [s for s in self.symbols if s in keep]
            else:
                yield f  # not ours — Spark evaluates it post-scan

    def partitions(self) -> list[SymbolBatch]:
        b = self.batch_size
        return [
            SymbolBatch(self.symbols[i : i + b])
            for i in range(0, len(self.symbols), b)
        ] or [SymbolBatch([])]

    def read(self, partition: SymbolBatch) -> Iterator[tuple]:
        for sym in partition.symbols:
            if self.asset_type == "CRYPTO":
                data = get_realtime_crypto_data(fake_transport, sym)
            elif self.asset_type == "FOREX":
                frm, to = sym.split("/", 1)
                data = get_realtime_forex_data(fake_transport, frm, to)
            else:
                data = get_realtime_stock_data(fake_transport, sym)
            yield (
                sym,
                self.asset_type,
                data["close"],
                data["change"],
                data["percent_change"],
                data["high"],
                data["low"],
                int(data["timestamp"]),
            )


class QuoteTickStreamReader(SimpleDataSourceStreamReader):
    """The reference's poll loop (ST1, etl/main.py:124-131) as a native
    streaming source: each micro-batch is one poll TICK over the symbol
    universe; the checkpointed offset is the tick counter, so restart
    resumes at the next un-committed tick (at-least-once, ST2) and
    ``readBetweenOffsets`` replays any tick deterministically (payloads
    are pure functions of (symbol, tick)). ``max_ticks`` bounds
    ``latestOffset`` so ``Trigger.AvailableNow`` drains exactly that
    many batches in tests — production leaves it unset and polls
    forever. State is ONE integer, regardless of symbol count."""

    def __init__(self, options: dict[str, str]) -> None:
        raw = options.get("symbols", "")
        self.symbols = [s.strip() for s in raw.split(",") if s.strip()]
        if not self.symbols:
            raise ValueError(
                "fintrack_quotes stream requires a 'symbols' option"
            )
        self.asset_type = options.get("asset_type", "STOCK").upper()
        self.max_ticks = int(options.get("max_ticks", "0"))  # 0 = unbounded

    def initialOffset(self) -> dict:  # noqa: N802 (Spark API name)
        return {"tick": 0}

    def _rows_for_tick(self, tick: int) -> Iterator[tuple]:
        for sym in self.symbols:
            data = get_realtime_stock_data(
                fake_transport, f"{sym}@{tick}"
            )
            yield (
                sym,
                self.asset_type,
                data["close"],
                data["change"],
                data["percent_change"],
                data["high"],
                data["low"],
                _EPOCH_ANCHOR + tick,
            )

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        # iter(list), not a generator: the wrapper both advances the
        # iterator (empty-batch validation) and pickles it into the
        # prefetch cache — list iterators do both, generators pickle not
        tick = start["tick"]
        if self.max_ticks and tick >= self.max_ticks:
            return iter([]), {"tick": tick}
        return iter(list(self._rows_for_tick(tick))), {"tick": tick + 1}

    def readBetweenOffsets(  # noqa: N802 (Spark API name)
        self, start: dict, end: dict
    ) -> Iterator[tuple]:
        return iter(
            [
                row
                for tick in range(start["tick"], end["tick"])
                for row in self._rows_for_tick(tick)
            ]
        )


class QuoteDataSource(DataSource):
    """``spark.dataSource.register(QuoteDataSource)`` then
    ``spark.read.format("fintrack_quotes").option("symbols", ...)`` or
    ``spark.readStream.format("fintrack_quotes")`` for the poll-tick
    stream."""

    @classmethod
    def name(cls) -> str:
        return "fintrack_quotes"

    def schema(self) -> str:
        return QUOTE_DDL

    def reader(self, schema) -> QuoteBatchReader:
        return QuoteBatchReader(dict(self.options))

    def simpleStreamReader(  # noqa: N802 (Spark API name)
        self, schema
    ) -> QuoteTickStreamReader:
        return QuoteTickStreamReader(dict(self.options))


def register(spark) -> None:
    # runtime-settable; without it Spark refuses a reader that
    # implements pushFilters (DATA_SOURCE_PUSHDOWN_DISABLED)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(QuoteDataSource)
