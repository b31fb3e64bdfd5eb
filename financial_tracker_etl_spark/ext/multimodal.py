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


_NULL_FEATURES = {
    "n_bytes": None,
    "first_byte": None,
    "fake_width": None,
    "fake_height": None,
}


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    A NULL payload yields a row with NULL features — the row is
    preserved so downstream audit joins don't lose items (and so one
    corrupt/missing blob can't kill a 100 TB decode job: the bare
    ``len(payload)`` previously raised TypeError inside the Arrow
    batch, failing the whole task — round-15 fuzzer, content nulls).
    Pandas nullable integer dtypes carry the Nones through Arrow into
    the LongType/IntegerType schema."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                fake_decode(p) if p is not None else _NULL_FEATURES
                for p in pdf["payload"]
            ]
            # explicit columns: pd.DataFrame([]) has NO columns, so the
            # astype dtype map would KeyError on a zero-row Arrow batch
            # (empty-relation inputs produce exactly those batches)
            out = pd.DataFrame(feats, columns=list(_NULL_FEATURES)).astype(
                {
                    "n_bytes": "Int64",
                    "first_byte": "Int32",
                    "fake_width": "Int32",
                    "fake_height": "Int32",
                }
            )
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("fake_width", IntegerType()),
        StructField("fake_height", IntegerType()),
        StructField("out_width", IntegerType()),
        StructField("out_height", IntegerType()),
    ]
)


def resize_plan(media: DataFrame, max_dim: int = 32) -> DataFrame:
    """Fit-within-``max_dim`` resize (aspect preserved, integer math —
    the PIL.thumbnail contract). The codec is the fake decoder; the
    geometry is the real resize arithmetic a production pipeline runs,
    kept in exact integers so it is oracle-checkable."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                d = fake_decode(p)
                w, h = d["fake_width"], d["fake_height"]
                m = max(w, h)
                if m <= max_dim:
                    ow, oh = w, h
                else:
                    ow = max(1, w * max_dim // m)
                    oh = max(1, h * max_dim // m)
                rows.append((doc_id, w, h, ow, oh))
            yield pd.DataFrame(
                rows, columns=[f.name for f in RESIZE_SCHEMA.fields]
            )

    return media.mapInPandas(batches, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_offset", LongType()),
        StructField("n_frame_bytes", IntegerType()),
        StructField("frame_checksum", LongType()),
    ]
)

FRAME_BYTES = 256


def sample_frames(media: DataFrame, every_n: int = 4) -> DataFrame:
    """Video-style frame sampling: the payload is treated as a
    concatenation of ``FRAME_BYTES`` frames; every ``every_n``-th frame
    is emitted as its own row — the 1→N fan-out shape real frame
    extraction has (one input row, many output rows per batch), which
    is exactly what ``mapInPandas`` exists for. Checksum is a stand-in
    for the per-frame tensor a real decoder would emit (pytest-checked;
    the geometric columns are oracle-checked)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                n = len(p)
                n_frames = (n + FRAME_BYTES - 1) // FRAME_BYTES
                for i in range(0, n_frames, every_n):
                    frame = p[i * FRAME_BYTES : (i + 1) * FRAME_BYTES]
                    rows.append(
                        (
                            doc_id,
                            i,
                            i * FRAME_BYTES,
                            len(frame),
                            sum(frame),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAME_SCHEMA.fields]
            )

    return media.mapInPandas(batches, schema=FRAME_SCHEMA)
