"""Source/sink connectors (SURVEY.md §2.A S7/S8).

The streaming pipeline is source-agnostic: everything downstream
consumes ``(topic, payload)`` rows. Tests use the JSON-file source
(``file_request_stream``); production swaps in Kafka with identical
downstream code. The Kafka builders mirror the reference's consumer /
producer configuration (reference: etl/main.py:86-131 consume loop,
etl/main.py:211-242 idempotent snappy-batched producer) — delivery
tuning (linger/batch/compression) maps onto Kafka sink options, and
offset tracking maps onto Spark checkpointing (ST2).

The kafka format needs the spark-sql-kafka package on the classpath;
builders are lazy (nothing touches the network until ``.load()`` /
``.start()``), so constructing them is safe anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..streaming.jobs import REQUEST_SCHEMA


def file_request_stream(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """JSON-lines drop-directory source — the standard S3/HDFS landing
    pattern at scale (each producer writes files; Spark tails the
    directory exactly-once via the checkpointed file index)."""
    reader = spark.readStream.schema(REQUEST_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(input_dir)


def kafka_source_options(
    bootstrap_servers: str,
    topics: list[str],
    starting_offsets: str = "earliest",
) -> dict[str, str]:
    """Consumer options mirroring the reference's consume loop
    (reference: etl/main.py:86-131). Exposed as a pure dict so the
    classpath-free test can pin them without a broker."""
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": ",".join(topics),
        "startingOffsets": starting_offsets,
        "failOnDataLoss": "false",
    }


def kafka_request_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: list[str],
    starting_offsets: str = "earliest",
) -> DataFrame:
    """S7: subscribe the request topics; emit (topic, payload) rows.
    UTF-8 decode == CAST(value AS STRING); empty-message skip (P6) and
    JSON parse (F4) happen downstream in the shared pipeline."""
    raw = (
        spark.readStream.format("kafka")
        .options(**kafka_source_options(bootstrap_servers, topics, starting_offsets))
        .load()
    )
    return raw.select(
        F.col("topic"), F.col("value").cast("string").alias("payload")
    )


def kafka_completion_sink(
    completions: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint_dir: str,
):
    """S8: completion events as JSON messages. Producer micro-batching /
    compression / idempotence from the reference map to kafka producer
    options; exactly-once-per-checkpoint comes from Spark's sink commit
    protocol."""
    payload = completions.select(
        F.to_json(F.struct(*completions.columns)).alias("value")
    )
    return (
        payload.writeStream.format("kafka")
        .options(**kafka_sink_options(bootstrap_servers, topic))
        .option("checkpointLocation", checkpoint_dir)
    )


def kafka_sink_options(bootstrap_servers: str, topic: str) -> dict[str, str]:
    """Producer options mirroring the reference's idempotent
    snappy-batched producer (reference: etl/main.py:221-231:
    linger_ms=5, batch_size=16384, compression_type='snappy',
    enable_idempotence=True). Pure dict for the broker-free pin test."""
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "topic": topic,
        "kafka.compression.type": "snappy",
        "kafka.linger.ms": "5",
        "kafka.batch.size": "16384",
        "kafka.enable.idempotence": "true",
    }
