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


def salted_join(
    large: DataFrame,
    skewed_small: DataFrame,
    key: str,
    n_salts: int = 8,
    salt_from: list[str] | None = None,
) -> DataFrame:
    """Skew-mitigated equi-join: identical result to
    ``large.join(skewed_small, key)`` but no single reducer ever owns a
    hot key's full row set.

    The large side gets a deterministic salt in ``[0, n_salts)`` hashed
    from ``salt_from`` columns (so replays are stable — no ``rand()``);
    the small side is replicated ``n_salts`` times via an exploded
    ``sequence``; the join key becomes ``(key, salt)``, splitting each
    hot key across ``n_salts`` reducers at the cost of an
    ``n_salts``-times-larger build side.

    This is the manual fallback for when AQE's skew-join splitting
    (``spark.sql.adaptive.skewJoin``, on in session.py) can't help:
    AQE splits oversized SHUFFLE partitions of a sort-merge join, but a
    single key that exceeds one partition on the BUILD side of a
    broadcast-hash join, or a skewed aggregation feeding the join, is
    out of its reach — salting restructures the key space itself.

    ``salt_from`` is REQUIRED and must vary within a key: a salt hashed
    from the join key alone is a pure function of the key, so every row
    of a hot key draws the same salt and still lands on one reducer —
    silently defeating the operator's purpose (results stay correct,
    skew does not move). Pass columns that differ across the hot key's
    rows (an id, a timestamp, a line number)."""
    if not salt_from or set(salt_from) <= {key}:
        raise ValueError(
            "salted_join: salt_from must name columns that vary within "
            f"a join key; got {salt_from!r}, which is a pure function "
            f"of the key {key!r} — every row of a hot key would draw "
            "the same salt and the skew would not move"
        )
    salt_cols = [F.col(c) for c in salt_from]
    salted_large = large.withColumn(
        "_salt", F.pmod(F.xxhash64(*salt_cols), F.lit(n_salts)).cast("int")
    )
    replicated = skewed_small.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>")),
    )
    return salted_large.join(replicated, [key, "_salt"]).drop("_salt")
