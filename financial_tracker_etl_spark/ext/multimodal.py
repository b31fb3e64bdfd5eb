"""[EXT] Multimodal column plumbing (BASELINE.json north_star).

Images/audio/video are opaque ``binary`` columns with typed metadata.
The Spark-side plumbing — schema, Arrow batch shape, ``mapInPandas``
signature, partitioning — is real and tested; the actual codec is a
deterministic fake behind :func:`fake_decode` because no media
libraries exist in this container (clearly marked; swap in
PIL/ffmpeg via the same batch interface in production).

Why mapInPandas: per-item decode is inherently Python-library work, so
the right Spark shape is Arrow-batched pandas iteration (10-100× over
row-at-a-time UDFs), with the binary payload never leaving the
executor.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("first_byte", IntegerType()),
        StructField("fake_width", IntegerType()),
        StructField("fake_height", IntegerType()),
    ]
)


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Synthesize a binary media column from document text (UTF-8
    bytes stand in for encoded image payloads)."""
    return documents.select(
        "doc_id",
        F.lit("image/fake").alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )


def fake_decode(payload: bytes) -> dict:
    """STUB codec — deterministic fake. A real implementation would be
    e.g. PIL.Image.open(io.BytesIO(payload)); the libraries are not
    available in this container."""
    n = len(payload)
    return {
        "n_bytes": n,
        "first_byte": payload[0] if n else -1,
        "fake_width": n % 64 + 1,
        "fake_height": n // 64 + 1,
    }


def real_decode(payload: bytes) -> dict:
    raise NotImplementedError(
        "media codecs (PIL/ffmpeg/torchaudio) are not installed in this "
        "environment; use fake_decode via extract_features()"
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [fake_decode(p) for p in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)
