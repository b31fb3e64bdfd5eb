"""Join / set operators (SURVEY.md §2.C J1–J6).

The reference implements these procedurally (Python set membership over
DB query results); relationally they are semi/anti joins. On a cluster
the request side is tiny (a Kafka payload) and the state side is huge,
so every join here broadcasts the small side explicitly — at 100 TB the
state table never shuffles for these.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import broadcast


def symbols_needing_update(
    requests: DataFrame, existing: DataFrame, keys: list[str]
) -> DataFrame:
    """J1: anti-join — requested assets with no current state row get
    fetched (reference: etl/jobs/fetch_market_data/fetch_market_data.py:16-29).

    ``existing`` may be 100 TB; ``requests`` is a payload. Broadcasting
    the requests is wrong for an anti-join *from* requests, so the join
    is requests LEFT ANTI existing: Spark builds the hash table on the
    right side only after AQE sizes it; with a huge right side we
    instead keep requests as the probe side and let AQE pick
    broadcast/ SMJ. The filter on ``existing`` should be pushed by the
    caller (e.g. partition pruning on symbol prefix) when available.
    """
    return requests.join(existing.select(*keys).distinct(), on=keys, how="left_anti")


def existing_symbols(
    state: DataFrame, requests: DataFrame, keys: list[str]
) -> DataFrame:
    """J2: semi-join — state rows whose key appears in the request set
    (reference: etl/fetch_utils.py:118-150, ``WHERE symbol = ANY(%s)``).

    The request side is broadcast: at scale this compiles to a
    BroadcastHashJoin with the 100 TB state as streamed side, and the
    ``isin``-style predicate can push into the parquet scan.
    """
    return state.join(broadcast(requests.select(*keys).distinct()), on=keys, how="left_semi")


def coverage_complete(requests: DataFrame, existing: DataFrame, keys: list[str]) -> bool:
    """J4: short-circuit — if every requested key already exists, skip
    the fetch entirely (reference:
    etl/jobs/fetch_market_index_data/fetch_market_index_data.py:161-165).

    Expressed as anti-join emptiness, not count comparison: ``isEmpty``
    stops at the first row instead of scanning everything.
    """
    return symbols_needing_update(requests, existing, keys).isEmpty()


def union_batches(*parts: DataFrame) -> DataFrame:
    """J6: union of per-batch results (reference:
    etl/jobs/fetch_market_data/fetch_market_data.py:94-107). In Spark a
    single DataFrame already spans partitions; this exists for explicit
    multi-source unions."""
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
