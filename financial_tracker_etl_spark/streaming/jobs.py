"""Topic → job routing table for the request stream (ST3).

The reference maps Kafka topics to dynamically-imported job modules
(reference: etl/main.py:43-59, 61-84). Here each job is a declarative
bundle: payload schema (F4 ``from_json``), required-field validation
(P1), typed transform (P2/P4/F9/F10) and merge key/version — so the
router is a plain ``filter`` per topic over one shared stream and every
job body is pure DataFrame code Catalyst can optimize.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, functions as F, types as T

from ..operators.validation import rename_project, split_valid

TOPIC_MARKET = "fetch-market-data-requests"
TOPIC_INDEX = "fetch-market-index-data-requests"
TOPIC_HISTORICAL = "fetch-historical-data-requests"

REQUEST_SCHEMA = T.StructType(
    [
        T.StructField("topic", T.StringType()),
        T.StructField("payload", T.StringType()),
    ]
)

QUOTE_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("quote_id", T.LongType()),
        T.StructField("symbol", T.StringType()),
        T.StructField("asset_type", T.StringType()),
        T.StructField("close", T.StringType()),
        T.StructField("percent_change", T.StringType()),
        T.StructField("change", T.StringType()),
        T.StructField("high", T.StringType()),
        T.StructField("low", T.StringType()),
        T.StructField("timestamp", T.LongType()),
    ]
)

INDEX_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType()),
        T.StructField("regularMarketPrice", T.DoubleType()),
        T.StructField("regularMarketChange", T.DoubleType()),
        T.StructField("regularMarketChangePercent", T.DoubleType()),
        T.StructField("regularMarketDayHigh", T.DoubleType()),
        T.StructField("regularMarketDayLow", T.DoubleType()),
    ]
)

MONTHLY_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("date", T.DateType()),
        T.StructField("asset_type", T.StringType()),
    ]
)


@dataclass(frozen=True)
class StreamJob:
    topic: str
    payload_schema: T.StructType
    required_fields: list[str]
    transform: Callable[[DataFrame], DataFrame]
    keys: list[str]
    version_cols: list[str]
    # a field whose non-null-ness proves the payload JSON parsed at all;
    # parse failures (from_json -> null struct) go to the dead letter
    # count (ST4), not to field-validation errors
    parse_probe: str = "symbol"

    def parse(self, batch: DataFrame) -> tuple[DataFrame, DataFrame]:
        """(parsed_rows, dead_letter_rows) for this job's topic.

        Blank payloads are P6 EMPTY-SKIPS, not dead letters: they are
        dropped from both outputs here (operators.validation
        .non_empty_messages — the same classification the routed
        pipeline's classify_all applies), so the two public APIs agree
        on the message classes."""
        from ..operators.validation import non_empty_messages

        mine = non_empty_messages(
            batch.filter(F.col("topic") == self.topic), "payload"
        )
        parsed = mine.select(
            F.from_json(F.col("payload"), self.payload_schema).alias("r"),
            F.col("payload"),
        )
        dead = parsed.filter(F.col(f"r.{self.parse_probe}").isNull()).select(
            "payload"
        )
        ok = parsed.filter(F.col(f"r.{self.parse_probe}").isNotNull()).select(
            "r.*"
        )
        return ok, dead

    def split(self, parsed: DataFrame) -> tuple[DataFrame, DataFrame]:
        return split_valid(parsed, self.required_fields)


def _market_transform(valid: DataFrame) -> DataFrame:
    """P4/F9 float() casts + F10 epoch→timestamp, projected to the
    market_data shape (reference:
    etl/jobs/fetch_market_data/fetch_market_data.py:36-56)."""
    return valid.select(
        "symbol",
        "asset_type",
        F.col("close").cast("double").alias("price"),
        F.col("change").cast("double").alias("change"),
        F.col("percent_change").cast("double").alias("percent_change"),
        F.col("high").cast("double").alias("high"),
        F.col("low").cast("double").alias("low"),
        F.timestamp_seconds(F.col("timestamp"))
        .cast("timestamp_ntz")
        .alias("updated_at"),
        F.col("quote_id").alias("_ver_seq"),
    )


def _content_ver(cols: list[str]) -> F.Column:
    """Deterministic per-row version for payloads that carry no natural
    sequence/timestamp: a 64-bit content hash. If the same key arrives
    twice with different payloads, max(hash) picks the survivor
    independent of partition/arrival order (the total-order-within-key
    contract state.py requires); identical payloads hash equal, so the
    tie-break then picks between identical rows and the outcome is
    order-free either way. Never surfaced — dropped on state read."""
    return F.xxhash64(*[F.col(c) for c in cols]).alias("_ver_seq")


def _index_transform(valid: DataFrame) -> DataFrame:
    """P2 Yahoo-style rename (reference:
    etl/jobs/fetch_market_index_data/fetch_market_index_data.py:49-69)
    + fixed write-stamp (F11 pinned for determinism)."""
    renamed = rename_project(
        valid,
        {
            "symbol": "symbol",
            "regularMarketPrice": "price",
            "regularMarketChange": "price_change",
            "regularMarketChangePercent": "percent_change",
            "regularMarketDayHigh": "price_high",
            "regularMarketDayLow": "price_low",
        },
    )
    return renamed.select(
        "*",
        F.lit("2024-01-01 00:00:00").cast("timestamp_ntz").alias("updated_at"),
        _content_ver(
            ["price", "price_change", "percent_change", "price_high", "price_low"]
        ),
    )


def _monthly_transform(valid: DataFrame) -> DataFrame:
    """Monthly rows are already typed/unique per key (reference upsert:
    etl/jobs/fetch_historical_market_data/fetch_historical_market_data.py:88-109)."""
    return valid.select(
        "symbol", "price", "date", "asset_type", _content_ver(["price"])
    )


MARKET_JOB = StreamJob(
    topic=TOPIC_MARKET,
    payload_schema=QUOTE_PAYLOAD_SCHEMA,
    required_fields=["close", "percent_change", "change", "high", "low"],
    transform=_market_transform,
    keys=["symbol", "asset_type"],
    version_cols=["updated_at", "_ver_seq"],
)

INDEX_JOB = StreamJob(
    topic=TOPIC_INDEX,
    payload_schema=INDEX_PAYLOAD_SCHEMA,
    required_fields=["regularMarketPrice"],
    transform=_index_transform,
    keys=["symbol"],
    version_cols=["updated_at", "_ver_seq"],
)

MONTHLY_JOB = StreamJob(
    topic=TOPIC_HISTORICAL,
    payload_schema=MONTHLY_PAYLOAD_SCHEMA,
    required_fields=["price", "date", "asset_type"],
    transform=_monthly_transform,
    keys=["symbol", "date", "asset_type"],
    version_cols=["_ver_seq"],
)

JOBS: tuple[StreamJob, ...] = (MARKET_JOB, INDEX_JOB, MONTHLY_JOB)
