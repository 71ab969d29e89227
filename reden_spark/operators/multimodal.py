"""Multimodal column plumbing: image/audio/video as opaque `binary` columns with
typed metadata, processed through Arrow-batched mapInPandas.

The container ships no image/audio codecs, so the decode step is STUBBED
(`decode_media` raises NotImplementedError; `fake_decode` is the deterministic
stand-in) — the Spark-side contract (schema, batching, partition behavior, UDF
signatures) is real and tested. Swapping in PIL/ffmpeg later only replaces the
two marked functions.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
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
        StructField("doc_id", LongType(), False),
        StructField("media_type", StringType(), True),  # image|audio|video
        StructField("payload", BinaryType(), True),  # opaque encoded bytes
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("media_type", StringType(), True),
        StructField("n_bytes", IntegerType(), True),
        StructField("payload_md5", StringType(), True),
        StructField("feature_0", IntegerType(), True),  # first byte (fake feature)
    ]
)


def attach_fake_media(docs: DataFrame) -> DataFrame:
    """Synthesize a deterministic binary payload per document (md5(text) bytes) plus
    typed metadata — a stand-in media table with the production schema."""
    return docs.select(
        "doc_id",
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (F.col("doc_id") % 3 + 1).cast("int")).alias(
            "media_type"
        ),
        F.unhex(F.md5("text")).alias("payload"),
        (F.col("doc_id") % 640 + 1).cast("int").alias("width"),
        (F.col("doc_id") % 480 + 1).cast("int").alias("height"),
        (F.col("doc_id") % 30000 + 1).cast("int").alias("duration_ms"),
    )


def decode_media(payload: bytes, media_type: str):  # pragma: no cover - stub
    """REAL decode hook — requires PIL/soundfile/ffmpeg, absent in this container."""
    raise NotImplementedError(
        f"media decoding for {media_type!r} requires codec libraries not present in this environment"
    )


def fake_decode(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for decode: (n_bytes, first_byte)."""
    return (len(payload or b""), payload[0] if payload else -1)


def extract_features(media: DataFrame, batch_size_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over mapInPandas — the production shape for
    per-item media processing (decode -> features) without ever collecting binary
    payloads to the driver."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            decoded = [fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [d[0] for d in decoded],
                    "payload_md5": [hashlib.md5(p or b"").hexdigest() for p in pdf["payload"]],
                    "feature_0": [d[1] for d in decoded],
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: explode each video row into frame timestamps
    (decode itself stubbed). Demonstrates the fan-out schema for frame-level work."""
    return (
        media.filter(F.col("media_type") == "video")
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))).alias("frame_ts_ms"),
        )
    )
