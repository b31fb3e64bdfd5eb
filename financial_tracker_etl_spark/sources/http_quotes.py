"""HTTP quote-source adapters (SURVEY.md §2.A S1-S5, §2.I B2, §2.G F3/F12).

The reference fetches quotes over HTTP per asset (Twelve Data-shaped
single-quote endpoints: etl/utils.py:141-366) and in symbol batches
(Yahoo-shaped ``quoteResponse.result``: etl/utils.py:75-139), with
retry-on-429 / skip-on-404 classification (etl/fetch_utils.py:45-116,
235-258). Those are *connector* concerns, deliberately kept OUT of the
relational core: an adapter's only job is to produce rows that
``spark.createDataFrame`` turns into the pipeline's input DataFrame
(→ quotes_raw shape, FIXTURES.md §1), after which everything is
Catalyst-planned DataFrame code.

Scale shape: fetches happen per-partition on executors in production
(``mapInPandas`` over a symbol DataFrame, each batch issuing one
multi-symbol call like S4) — never a driver-side loop over ``collect``.
The transport is injected so tests use a deterministic fake; nothing
here imports an HTTP client at module scope.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable, Iterable
from urllib.parse import quote as urlquote

# (url, params) -> decoded JSON. Tests inject a fake; production wires
# urllib/requests here.
Transport = Callable[[str, dict[str, Any]], dict[str, Any]]


class TransportError(Exception):
    """HTTP-layer failure; ``status`` drives the retry classification
    (F12: the reference string-matches "429"/"404" in str(e),
    etl/fetch_utils.py:92, 242-249 — we keep the status explicit)."""

    def __init__(self, status: int, message: str = "") -> None:
        super().__init__(f"{status} {message}".strip())
        self.status = status


@dataclass
class RetryPolicy:
    """B2: bounded retry with fixed delay on rate-limit, permanent skip
    on not-found (reference defaults: max_retries=3, retry_delay=60 s,
    etl/fetch_utils.py:45)."""

    max_retries: int = 3
    retry_delay: float = 60.0
    sleep: Callable[[float], None] = time.sleep
    attempts: list[int] = field(default_factory=list)

    def run(self, call: Callable[[], dict | None]) -> dict | None:
        """Returns the payload, or None when the symbol should be
        skipped (404, or retries exhausted — the reference logs and
        moves on rather than failing the job, etl/fetch_utils.py:235-258)."""
        for attempt in range(1, self.max_retries + 1):
            try:
                out = call()
                self.attempts.append(attempt)
                return out
            except TransportError as e:
                if e.status == 404:
                    self.attempts.append(attempt)
                    return None
                if e.status == 429 and attempt < self.max_retries:
                    self.sleep(self.retry_delay)
                    continue
                if e.status == 429:
                    self.attempts.append(attempt)
                    return None
                raise
        return None


BASE_QUOTE_URL = "https://api.example-quotes.invalid/quote"
BASE_BATCH_URL = "https://api.example-quotes.invalid/market/v2/get-quotes"
BASE_SERIES_URL = "https://api.example-quotes.invalid/time_series"


def _require(payload: dict, key: str) -> None:
    # P3 response-shape validation (reference: etl/utils.py:116-126,
    # 166-168, 277-279 — ValueError on missing envelope keys)
    if payload is None or key not in payload:
        raise ValueError(f"Unexpected API response: missing '{key}'")


def get_realtime_stock_data(transport: Transport, symbol: str) -> dict:
    """S1: one symbol's realtime quote; validates the 'close' field
    exists (reference: etl/utils.py:141-175)."""
    data = transport(BASE_QUOTE_URL, {"symbol": symbol})
    _require(data, "close")
    return data


def get_realtime_crypto_data(
    transport: Transport, symbol: str, market: str = "USD"
) -> dict:
    """S2: crypto quote, symbol rendered ``{symbol}/{market}`` (F2;
    reference: etl/utils.py:177-211)."""
    return get_realtime_stock_data(transport, f"{symbol}/{market}")


def get_realtime_forex_data(
    transport: Transport, from_symbol: str, to_symbol: str
) -> dict:
    """S3: forex quote for the pair ``from/to`` (F1/F2; reference:
    etl/utils.py:213-247)."""
    return get_realtime_stock_data(transport, f"{from_symbol}/{to_symbol}")


def quote_market_index_data(
    transport: Transport, symbols: list[str], region: str = "US"
) -> list[dict]:
    """S4: one call for N symbols (F3 url-encode + comma-join;
    reference: etl/utils.py:75-139). Unwraps ``quoteResponse.result``."""
    rendered = ",".join(urlquote(s) for s in symbols)
    data = transport(BASE_BATCH_URL, {"region": region, "symbols": rendered})
    _require(data, "quoteResponse")
    _require(data["quoteResponse"], "result")
    return data["quoteResponse"]["result"]


def get_historical_data(
    transport: Transport,
    symbol: str,
    start_date: str,
    end_date: str,
    interval: str = "1month",
) -> list[dict]:
    """S5: monthly time-series for a date range; unwraps ``values``
    (reference: etl/utils.py:249-366 — stock/crypto/fx variants differ
    only in symbol rendering, handled by S2/S3 renderers above)."""
    data = transport(
        BASE_SERIES_URL,
        {
            "symbol": symbol,
            "interval": interval,
            "start_date": start_date,
            "end_date": end_date,
        },
    )
    _require(data, "values")
    return data["values"]


def fetch_assets(
    transport: Transport,
    assets: Iterable[dict],
    policy: RetryPolicy | None = None,
) -> list[dict]:
    """S6+B2 driver: dispatch each asset by type, retrying per policy;
    unknown types and permanently-failed symbols are skipped (rows
    dropped), matching reference semantics (etl/fetch_utils.py:6-27,
    45-116). Returns quote payload rows ready for createDataFrame."""
    policy = policy or RetryPolicy()
    out: list[dict] = []
    for asset in assets:
        sym, typ = asset.get("symbol"), asset.get("asset_type")

        def call() -> dict | None:
            if typ == "STOCK":
                return get_realtime_stock_data(transport, sym)
            if typ == "CRYPTO":
                return get_realtime_crypto_data(transport, sym)
            if typ == "FOREX":
                frm, to = sym.split("/", 1) if "/" in sym else (sym, "USD")
                return get_realtime_forex_data(transport, frm, to)
            return None  # unknown asset type -> dropped

        payload = policy.run(call)
        if payload is not None:
            out.append({"symbol": sym, "asset_type": typ, **payload})
    return out
