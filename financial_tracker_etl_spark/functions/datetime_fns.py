"""Calendar/date helpers (SURVEY.md §2.G F5–F8).

The reference steps months with ``relativedelta(months=1)`` and
normalizes to the first of the month with ``.replace(day=1)``
(reference: etl/fetch_utils.py:182-233). Spark equivalents are
``trunc``/``add_months``/``sequence`` — calendar-month arithmetic, never
30-day intervals (SURVEY.md §7 watch-out (b)).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def month_floor(col: Column) -> Column:
    """First-of-month normalization (reference: etl/fetch_utils.py:190-191)."""
    return F.trunc(col.cast("date"), "month")


def clamp_end_date(end: Column, today: Column | None = None) -> Column:
    """Clamp a range end to today so future months are never requested
    (reference: etl/fetch_utils.py:195-196)."""
    return F.least(end, today if today is not None else F.current_date())


def month_sequence(start: Column, end: Column) -> Column:
    """Inclusive month spine start..end as array<date>
    (reference month loop: etl/fetch_utils.py:212-218)."""
    return F.sequence(
        month_floor(start), month_floor(end), F.expr("interval 1 month")
    )
