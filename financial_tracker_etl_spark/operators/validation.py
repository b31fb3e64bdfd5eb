"""Validation / projection operators (SURVEY.md §2.B P1–P6).

The reference validates records field-by-field and raises
``ValueError("Missing or invalid field '<f>'")`` on the first violation
(reference: etl/fetch_utils.py:30-43; required set at
etl/jobs/fetch_market_data/fetch_market_data.py:95). At 100 TB a
row-at-a-time raise is useless; the engine expresses the same semantics
relationally:

- :func:`project_required` — keep exactly the required columns (P1),
- :func:`split_valid` — valid/invalid row split, invalid rows tagged
  with the *first* offending field name (matching the reference's
  first-field error message),
- :func:`require_valid` — strict variant that raises with the
  reference's message if any violation exists (driver/tests only; the
  check is a distributed count, not a collect).

Everything is built-in column expressions — no UDFs, stays inside
whole-stage codegen.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F


def project_required(df: DataFrame, required_fields: list[str]) -> DataFrame:
    """P1: projection to exactly the required fields
    (reference: etl/fetch_utils.py:35-41)."""
    return df.select(*required_fields)


def _first_violation(required_fields: list[str]) -> Column:
    """Name of the first missing/null required field, else NULL.

    Mirrors the reference's loop order: it raises on the FIRST bad field
    (reference: etl/fetch_utils.py:36-39).
    """
    expr: Column = F.lit(None).cast("string")
    for f in reversed(required_fields):
        expr = F.when(F.col(f).isNull(), F.lit(f)).otherwise(expr)
    return expr


def split_valid(
    df: DataFrame, required_fields: list[str]
) -> tuple[DataFrame, DataFrame]:
    """Valid/invalid split. Invalid rows carry ``error_field``.

    The reference drops nothing silently — bad rows error (reference:
    etl/fetch_utils.py:38-39) — so the invalid side is surfaced, not
    discarded (dead-letter pattern at scale).
    """
    tagged = df.withColumn("error_field", _first_violation(required_fields))
    valid = tagged.filter(F.col("error_field").isNull()).drop("error_field")
    invalid = tagged.filter(F.col("error_field").isNotNull())
    return valid, invalid


def require_valid(df: DataFrame, required_fields: list[str]) -> DataFrame:
    """Strict P1: raise ``ValueError`` naming the first bad field if any
    row violates, else return the projection. Message text matches the
    reference exactly (pinned by tests/test_data_processing.py:123-157)."""
    _, invalid = split_valid(df, required_fields)
    bad = invalid.select("error_field").first()
    if bad is not None:
        raise ValueError(f"Missing or invalid field '{bad['error_field']}'")
    return project_required(df, required_fields)


def filter_not_null(df: DataFrame, fields: list[str]) -> DataFrame:
    """Permissive P1 variant: keep rows where all fields are non-null."""
    cond = reduce(lambda a, b: a & b, [F.col(f).isNotNull() for f in fields])
    return df.filter(cond)


def rename_project(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """P2: projection + rename, e.g. regularMarketPrice -> price
    (reference: etl/jobs/fetch_market_index_data/fetch_market_index_data.py:49-69)."""
    return df.select(*[F.col(src).alias(dst) for src, dst in mapping.items()])


def cast_measures(df: DataFrame, casts: dict[str, str]) -> DataFrame:
    """P4: typed casts, e.g. string-decimal -> double — the engine-side
    equivalent of ``float("204.60001")``
    (reference: etl/jobs/fetch_market_data/fetch_market_data.py:50-54)."""
    out = df
    for name, dtype in casts.items():
        out = out.withColumn(name, F.col(name).cast(dtype))
    return out


def drop_unknown_asset_types(df: DataFrame, known: tuple[str, ...]) -> DataFrame:
    """S6 dispatch residue: unknown asset types are silently dropped
    (reference: etl/fetch_utils.py:6-27; pinned by
    tests/test_data_processing.py:87-96)."""
    return df.filter(F.col("asset_type").isin(list(known)))


def non_empty_messages(df: DataFrame, value_col: str = "value") -> DataFrame:
    """P6: skip blank stream messages (reference: etl/main.py:151-153)."""
    c = F.col(value_col)
    return df.filter(c.isNotNull() & (F.length(F.trim(c)) > 0))
