"""Custom stateful streaming operator: per-key EWMA via
``applyInPandasWithState`` (ST7 extension; SURVEY.md §2.J notes the
reference has no user-extensible operator surface — this is the
Spark-native one).

Semantics: for each user, fold event values in (ts_us, event_id) order
through ``ewma = (1-α)·ewma + α·value`` (seeded with the first value).
State carries ``(ewma, n)`` across micro-batches, so the operator runs
unbounded with O(keys) state; each batch emits the key's updated
running value (output mode ``update``).

Determinism caveat, encoded in the harness: the fold order must be a
total order (ts_us, event_id), and cross-batch correctness requires
batches to arrive time-ordered per key — guaranteed here by replaying
the source as one AvailableNow batch; in production by Kafka per-key
partition ordering. Arrow does the Python transfer in columnar batches
(the only Python in the whole engine's hot paths, and it is the
genuinely-custom fold Spark has no builtin for).
"""

from __future__ import annotations

import os
import tempfile
from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .windows import events_stream

EWMA_ALPHA = 0.1


def _ewma_fn(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    pdf = pd.concat(list(pdfs)).sort_values(["ts_us", "event_id"])
    ewma, n = state.get if state.exists else (None, 0)
    for v in pdf["value"]:
        v = float(v)
        ewma = v if ewma is None else (1.0 - EWMA_ALPHA) * ewma + EWMA_ALPHA * v
        n += 1
    state.update((ewma, n))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "ewma_value": [ewma]}
    )


def ewma_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the stateful EWMA over the replayed events stream and return
    the final per-user values."""
    ev = events_stream(spark, sf_dir).select(
        "user_id", "ts_us", "event_id", "value"
    )
    updated = ev.groupBy("user_id").applyInPandasWithState(
        _ewma_fn,
        outputStructType="user_id long, n_events long, ewma_value double",
        stateStructType="ewma double, n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    out_dir = tempfile.mkdtemp(prefix="ftes_ewma_")
    sink, ckpt = os.path.join(out_dir, "sink"), os.path.join(out_dir, "ckpt")

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        batch.write.mode("append").parquet(sink)

    q = (
        updated.writeStream.foreachBatch(write_batch)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update-mode emits one row per key per batch; the last batch's row
    # is the final state — with a single AvailableNow batch it is the
    # only row. Keep max-n per key to be robust to multi-batch replays.
    raw = spark.read.parquet(sink)
    from pyspark.sql import Window, functions as F

    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        raw.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .select(
            "user_id", "n_events", F.round("ewma_value", 6).alias("ewma_value")
        )
    )
