"""B4 cache-first degradation (SURVEY.md §2.I; reference:
etl/jobs/fetch_market_index_data/fetch_market_index_data.py:205-221).

When the live fetch fails, the reference serves whatever rows the DB
already holds instead of failing the request. That is orchestration,
not relational logic, so it lives here as a tiny combinator over
DataFrame-producing callables — the relational core stays pure."""

from __future__ import annotations

import logging
from typing import Callable

from pyspark.sql import DataFrame

log = logging.getLogger(__name__)


def fetch_with_fallback(
    fetch: Callable[[], DataFrame],
    cached: Callable[[], DataFrame],
    on_error: tuple[type[Exception], ...] = (Exception,),
) -> tuple[DataFrame, bool]:
    """Returns (df, degraded). ``fetch`` errors are contained and the
    cached view is served, flagged so completion events can report
    degradation (the reference logs and returns existing data)."""
    try:
        return fetch(), False
    except on_error as e:  # noqa: BLE001 - mirror reference catch-all
        log.warning("fetch failed (%s); serving cached data", e)
        return cached(), True
