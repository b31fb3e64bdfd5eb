"""ST6 scheduled batch trigger (reference: etl/scheduler.py:5-13).

The reference blocks in a ``schedule`` loop and fires the market-index
job daily at 16:00 (U.S. market close). The Spark-first twin runs each
tick as a ``Trigger.AvailableNow`` pass of the index topic through the
SAME routed pipeline the consume loop uses (streaming.pipeline) — the
scheduled path and the streaming path share one code path, and the
keyed merge is idempotent, so a duplicated or replayed tick cannot
corrupt state.

Only the next-fire-time arithmetic is bespoke (pure, unit-tested); the
wait loop is a thin sleep wrapper around it.
"""

from __future__ import annotations

import datetime as dt
import time
from typing import Callable

from pyspark.sql import SparkSession

from .jobs import TOPIC_INDEX
from .pipeline import PipelineResult, run_routed_pipeline


def run_index_tick(
    spark: SparkSession, sf_dir: str, work_dir: str | None = None
) -> PipelineResult:
    """One scheduled firing: the index job end to end (request messages
    → AvailableNow micro-batches → keyed merge), nothing else."""
    return run_routed_pipeline(
        spark,
        sf_dir,
        work_dir=work_dir,
        topics=(TOPIC_INDEX,),
        seed_market_state=False,
    )


def seconds_until(at: str, now: dt.datetime) -> float:
    """Seconds from ``now`` to the next daily HH:MM firing (pure)."""
    hh, mm = (int(x) for x in at.split(":"))
    target = now.replace(hour=hh, minute=mm, second=0, microsecond=0)
    if target <= now:
        target += dt.timedelta(days=1)
    return (target - now).total_seconds()


def schedule_index_job(
    spark: SparkSession,
    sf_dir: str,
    at: str = "16:00",
    once: bool = False,
    max_ticks: int | None = None,
    sleep_fn: Callable[[float], None] = time.sleep,
    now_fn: Callable[[], dt.datetime] = dt.datetime.now,
) -> int:
    """Daily trigger loop. ``once=True`` fires immediately a single
    time and returns (the tested/driver path); otherwise sleeps until
    the next ``at`` each cycle, ``max_ticks`` bounding the loop for
    tests (None = run forever, like the reference).

    Every tick runs against ONE shared work dir (state + checkpoint):
    state accumulates across ticks like the reference's persistent
    store (so a replayed tick is genuinely idempotent against real
    prior state), and a run-forever scheduler does not leak one
    scratch state+checkpoint directory per day."""
    import tempfile

    work_dir = tempfile.mkdtemp(prefix="ftes_sched_")
    ticks = 0
    while True:
        if not once:
            sleep_fn(seconds_until(at, now_fn()))
        result = run_index_tick(spark, sf_dir, work_dir=work_dir)
        n = result.state_df(TOPIC_INDEX).count()
        print(f"index tick {ticks}: {n} state rows, {result.n_batches} batches")
        ticks += 1
        if once or (max_ticks is not None and ticks >= max_ticks):
            return 0
