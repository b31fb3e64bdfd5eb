"""As-of (point-in-time) join — a custom operator Spark's join menu
lacks, composed from union + ordered window (SURVEY.md §2.C notes the
reference has no interval/as-of joins; this is the financial-domain
operator a quote store needs: "the prevailing quote at trade time").

Semantics: for each left row, attach the right row with the greatest
``right_ts <= left_ts`` within the same key (inclusive, matching
DuckDB/kdb ASOF), NULLs when no right row precedes.

Why union-sort instead of a range join: one shuffle + one sort on
(keys, ts) total — the same cost as a regular sort-merge join — and no
quadratic candidate blowup. At 100 TB both sides shuffle once on the
key; a per-row "latest quote" subquery or an inequality join would be
O(n·m) within key. This is the standard last-observation-carried-
forward formulation: interleave both sides in time order, then
``last(value, ignorenulls=True)`` over rows-unbounded-preceding carries
each quote forward to the trades after it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    right_seq: str | None = None,
) -> DataFrame:
    """Left as-of join. ``value_cols`` are carried from the right side.

    All value columns are carried as ONE struct through the window, so
    every output value comes from the SAME matched right row, and a
    right row whose value column is legitimately NULL is still the
    match (it does not fall through to an older row) — carrying each
    column independently with ``last(ignorenulls)`` would do both
    (round-1 latent bug, flagged by the round-1 advisor).

    Determinism: if the right side can hold duplicate (key, ts) rows,
    pass ``right_seq`` (a total per-key order, e.g. a quote id) so the
    carried row is well-defined; otherwise dedupe upstream.
    """
    rtypes = dict(right.dtypes)
    ltypes = dict(left.dtypes)
    left_only = [c for c in left.columns if c not in on]
    seq = right_seq or "_noseq"
    vstruct_type = (
        "struct<" + ",".join(f"{c}:{rtypes[c]}" for c in value_cols) + ">"
    )

    l2 = left.select(
        *on,
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_src"),
        F.lit(0).cast("long").alias("_seq"),
        *[F.col(c) for c in left_only],
        F.lit(None).cast(vstruct_type).alias("_vs"),
    )
    # a right row with a NULL timestamp cannot prevail "as of" any
    # instant — but NULLS FIRST in the ascending sort would place it
    # before every real row and last(ignorenulls) would carry it as a
    # phantom match for left rows that predate all real right rows
    right = right.filter(F.col(right_ts).isNotNull())
    r2 = right.select(
        *on,
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_src"),
        (F.col(seq) if right_seq else F.lit(0)).cast("long").alias("_seq"),
        *[F.lit(None).cast(ltypes[c]).alias(c) for c in left_only],
        F.struct(*value_cols).alias("_vs"),
    )
    # right rows sort before left rows at equal ts => inclusive (>=)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_t").asc(), F.col("_src").asc(), F.col("_seq").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = l2.unionByName(r2)
    carried = u.select(
        *on,
        "_src",
        F.col("_t"),
        *[F.col(c) for c in left_only],
        F.last("_vs", ignorenulls=True).over(w).alias("_vs"),
    )
    return (
        carried.filter(F.col("_src") == 1)
        .select(
            *on,
            *left_only,
            *[F.col(f"_vs.{c}").alias(c) for c in value_cols],
        )
    )
