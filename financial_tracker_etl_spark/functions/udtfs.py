"""Python UDTF surface (SURVEY.md §2.J: the reference has no
user-extensible function mechanism; this is the Spark-native one).

``MonthSpineUDTF`` is the month-range expansion (F7) as a lateral table
function — one input row fans out to one row per calendar month. The
engine's hot path uses the JVM-side ``sequence()+explode`` for this
(operators/gaps.py); the UDTF form exists for genuinely-custom fan-out
logic that can't be expressed in builtins, and is oracle-checked to
prove the two agree exactly.
"""

from __future__ import annotations

import datetime

from pyspark.sql.functions import udtf


@udtf(returnType="month: date")
class MonthSpineUDTF:
    """Yield the first-of-month dates from start..end inclusive
    (calendar months — mirrors relativedelta stepping, reference:
    etl/fetch_utils.py:212-218; never 30-day intervals, SURVEY.md
    §7 watch-out (b))."""

    def eval(self, start: datetime.date, end: datetime.date):
        if start is None or end is None:
            return
        y, m = start.year, start.month
        while (y, m) <= (end.year, end.month):
            yield (datetime.date(y, m, 1),)
            m += 1
            if m == 13:
                y, m = y + 1, 1


def register_udtfs(spark) -> None:
    spark.udtf.register("month_spine_udtf", MonthSpineUDTF)
