"""Snapshot diff / change-data-capture between two keyed table states.

The reference's jobs are all built around "diff the incoming request
against what the store already has" (SURVEY.md §2.C J1-J3, §2.I B3).
This operator closes the loop on the write side: given two snapshots of
a keyed table, classify every key as inserted / deleted / updated /
unchanged — the change feed a downstream consumer (cache invalidation,
completion events, audit) reads. One full-outer join on the key, which
is the minimum; at scale both snapshots share the state table's
bucketing so the join co-locates (operators/bucketing.py).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F


def snapshot_diff(
    old: DataFrame, new: DataFrame, keys: list[str]
) -> DataFrame:
    """Rows keyed like ``new`` (or ``old`` for deletes) with a
    ``change_type`` column: inserted | deleted | updated | unchanged.
    Value comparison is null-safe (``eqNullSafe``) across all non-key
    columns present in both snapshots."""
    value_cols = [
        c for c in new.columns if c not in keys and c in set(old.columns)
    ]
    o = old.alias("o")
    n = new.alias("n")
    cond = reduce(
        lambda a, b: a & b, [F.col(f"o.{k}") == F.col(f"n.{k}") for k in keys]
    )
    joined = o.join(n, cond, "full_outer")
    same_vals = reduce(
        lambda a, b: a & b,
        [
            F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
            for c in value_cols
        ],
        F.lit(True),
    )
    new_key_null = F.col(f"n.{keys[0]}").isNull()
    old_key_null = F.col(f"o.{keys[0]}").isNull()
    change = (
        F.when(old_key_null, "inserted")
        .when(new_key_null, "deleted")
        .when(same_vals, "unchanged")
        .otherwise("updated")
    )
    out_keys = [
        F.coalesce(F.col(f"n.{k}"), F.col(f"o.{k}")).alias(k) for k in keys
    ]
    # Values come from the NEW side verbatim for inserted/updated/
    # unchanged rows and from the OLD side only for deletes. A
    # coalesce here would be wrong: an update that sets a value column
    # to NULL must carry NULL so apply_changes reproduces `new` exactly
    # (the cdc_apply_roundtrip contract) — coalesce would smuggle the
    # old value back in.
    out_vals = [
        F.when(new_key_null, F.col(f"o.{c}"))
        .otherwise(F.col(f"n.{c}"))
        .alias(c)
        for c in value_cols
    ]
    return joined.select(*out_keys, *out_vals, change.alias("change_type"))


def apply_changes(
    state: DataFrame, changes: DataFrame, keys: list[str]
) -> DataFrame:
    """MERGE a ``snapshot_diff`` change feed into ``state``: inserted /
    updated rows take the feed's values, ``deleted`` keys drop, keys
    absent from the feed (and ``unchanged`` rows) keep their state
    values — i.e. ``apply_changes(old, snapshot_diff(old, new), keys)``
    reproduces ``new`` exactly (the round-trip the
    ``cdc_apply_roundtrip`` query oracles). This is the DELETE-capable
    write path the keyed upsert (last-write-wins union) cannot express:
    one full-outer join on the key — same single-shuffle shape as the
    diff itself, co-located under the state table's bucketing."""
    value_cols = [
        c
        for c in state.columns
        if c not in keys and c in set(changes.columns)
    ]
    s = state.alias("s")
    c = changes.alias("c")
    joined = s.join(c, on=keys, how="full_outer")
    applied = joined.filter(
        F.coalesce(F.col("c.change_type") != "deleted", F.lit(True))
    )
    return applied.select(
        *keys,
        *[
            F.when(
                F.col("c.change_type").isNotNull(), F.col(f"c.{v}")
            )
            .otherwise(F.col(f"s.{v}"))
            .alias(v)
            for v in value_cols
        ],
    )
