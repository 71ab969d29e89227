"""Multimodal column plumbing: image/audio/video as opaque `binary` columns with
typed metadata, processed through Arrow-batched mapInPandas.

The container ships no image/audio codecs, so codec-backed decoding is STUBBED
(`decode_media` raises NotImplementedError; `fake_decode` is the deterministic
stand-in) — the Spark-side contract (schema, batching, partition behavior, UDF
signatures) is real and tested. Swapping in PIL/ffmpeg later only replaces the
two marked functions. All three modalities decode END-TO-END for real via
uncompressed formats: binary netpbm P6 images (`encode_ppm`/`decode_ppm`/
`image_stats`), PCM mono 16-bit WAV audio (`encode_wav`/`decode_wav`/
`audio_stats`) and raw YUV4MPEG2 video with per-frame sampling (`encode_y4m`/
`decode_y4m_frames`/`frame_luma_stats`) — genuine encode -> header-parse ->
statistics pipelines in pure Python/numpy, each parity-tested against an
independent reference decode and an exact DuckDB oracle.
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
        StructField("payload_md5", StringType(), True),  # md5 of lowercase-hex(payload)
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
        # coalesce: md5(NULL) is NULL, which would silently diverge from the
        # PPM/WAV/Y4M twins (they seed from `text or ""` worker-side)
        F.unhex(F.md5(F.coalesce("text", F.lit("")))).alias("payload"),
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


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over mapInPandas — the production shape for
    per-item media processing (decode -> features) without ever collecting binary
    payloads to the driver. Batch sizing is the session's
    spark.sql.execution.arrow.maxRecordsPerBatch.

    ``payload_md5`` fingerprints the payload as md5 of its lowercase-hex encoding
    (not md5 of the raw bytes): the value is computed worker-side from the binary
    column, and the hex detour makes it expressible in engines whose md5 only
    accepts strings — which is what gives this query an exact DuckDB oracle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            decoded = [fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [d[0] for d in decoded],
                    "payload_md5": [
                        hashlib.md5(bytes(p or b"").hex().encode()).hexdigest()
                        for p in pdf["payload"]
                    ],
                    "feature_0": [d[1] for d in decoded],
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


IMAGE_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("mean_r", IntegerType(), True),  # 0-255, floor of channel mean
        StructField("mean_g", IntegerType(), True),
        StructField("mean_b", IntegerType(), True),
    ]
)


def encode_ppm(width: int, height: int, rgb: bytes) -> bytes:
    """Binary netpbm P6 image: 'P6\\n{w} {h}\\n255\\n' + w*h*3 raw RGB bytes.
    Uncompressed, so it encodes/decodes with zero codec libraries — the one
    image format this container can process END-TO-END for real."""
    if len(rgb) != width * height * 3:
        raise ValueError(f"need {width * height * 3} RGB bytes, got {len(rgb)}")
    return b"P6\n%d %d\n255\n" % (width, height) + rgb


def decode_ppm(payload: bytes) -> tuple[int, int, int, int, int]:
    """REAL decode of a binary P6 PPM: (width, height, mean_r, mean_g, mean_b),
    channel means floored to ints. Raises ValueError on malformed input."""
    import re

    import numpy as np

    if not payload or not payload.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    # header = magic, width, height, maxval, then EXACTLY ONE whitespace byte
    # before the raw pixel data — bytes.split() would also eat whitespace BYTES
    # that happen to start the pixel payload (0x0a/0x20 are valid pixel values)
    m = re.match(rb"P6\s+(\d+)\s+(\d+)\s+(\d+)[ \t\r\n]", payload)
    if not m:
        raise ValueError("truncated PPM header")
    w, h, maxval = int(m.group(1)), int(m.group(2)), int(m.group(3))
    if maxval != 255:
        raise ValueError(f"only 8-bit PPM supported, maxval={maxval}")
    if w == 0 or h == 0:
        raise ValueError("zero-dimension PPM")
    px = np.frombuffer(payload[m.end() : m.end() + w * h * 3], dtype=np.uint8)
    if px.size != w * h * 3:
        raise ValueError("truncated PPM pixel data")
    means = px.reshape(-1, 3).mean(axis=0)
    return (w, h, int(means[0]), int(means[1]), int(means[2]))


def attach_ppm_media(docs: DataFrame) -> DataFrame:
    """Synthesize VALID binary PPM images deterministically from each document
    (dimensions from doc_id, pixels by cycling md5(text) bytes) — real encoded
    payloads for the real decoder, generated worker-side via mapInPandas so no
    binary ever visits the driver."""
    import hashlib

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, widths, heights = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                w, h = int(doc_id) % 7 + 2, int(doc_id) % 5 + 2
                seed = hashlib.md5((text or "").encode()).digest()
                rgb = (seed * (w * h * 3 // len(seed) + 1))[: w * h * 3]
                payloads.append(encode_ppm(w, h, rgb))
                widths.append(w)
                heights.append(h)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": "image",
                    "payload": payloads,
                    "width": widths,
                    "height": heights,
                    "duration_ms": None,
                }
            )

    return docs.select("doc_id", "text").mapInPandas(gen, MEDIA_SCHEMA)


def image_stats(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL image decoding over mapInPandas: per image, dimensions
    from the payload header (not trusted metadata) + per-channel means. The
    production shape for decode->feature pipelines; payloads stay on workers."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [decode_ppm(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [r[0] for r in rows],
                    "height": [r[1] for r in rows],
                    "mean_r": [r[2] for r in rows],
                    "mean_g": [r[3] for r in rows],
                    "mean_b": [r[4] for r in rows],
                }
            )

    return media.filter(F.col("media_type") == "image").mapInPandas(run, IMAGE_STATS_SCHEMA)


AUDIO_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("sample_rate", IntegerType(), True),
        StructField("n_samples", IntegerType(), True),
        StructField("rms", IntegerType(), True),  # floor of RMS amplitude
    ]
)


def encode_wav(sample_rate: int, pcm: bytes) -> bytes:
    """Canonical 44-byte RIFF/WAVE header (PCM, mono, 16-bit LE) + raw samples —
    the second format this container can decode END-TO-END without codecs."""
    import struct

    n = len(pcm)
    return (
        b"RIFF"
        + struct.pack("<I", 36 + n)
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", n)
        + pcm
    )


def decode_wav(payload: bytes) -> tuple[int, int, int]:
    """REAL decode of a PCM WAV: (sample_rate, n_samples, floor(RMS amplitude)).
    Raises ValueError on malformed/compressed input."""
    import struct

    import numpy as np

    if not payload or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    if payload[12:16] != b"fmt " or len(payload) < 44:
        raise ValueError("truncated WAV header")
    fmt, channels, sample_rate, _, _, bits = struct.unpack("<HHIIHH", payload[20:36])
    if fmt != 1 or channels != 1 or bits != 16:
        raise ValueError("only PCM mono 16-bit supported")
    if payload[36:40] != b"data":
        raise ValueError("missing data chunk")
    (n_bytes,) = struct.unpack("<I", payload[40:44])
    samples = np.frombuffer(payload[44 : 44 + n_bytes], dtype="<i2")
    if samples.size * 2 != n_bytes:
        raise ValueError("truncated PCM data")
    rms = int((samples.astype(np.float64) ** 2).mean() ** 0.5) if samples.size else 0
    return (sample_rate, int(samples.size), rms)


def attach_wav_media(docs: DataFrame) -> DataFrame:
    """Synthesize VALID mono 16-bit PCM WAV payloads deterministically from each
    document (sample count/rate from doc_id, PCM bytes by cycling md5(text)) —
    real encoded audio for the real decoder, generated worker-side."""
    import hashlib

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, durations = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                n = int(doc_id) % 50 + 10  # samples
                rate = 8000 + int(doc_id) % 4 * 4000
                seed = hashlib.md5((text or "").encode()).digest()
                pcm = (seed * (2 * n // len(seed) + 1))[: 2 * n]
                payloads.append(encode_wav(rate, pcm))
                durations.append(int(n * 1000 / rate))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": "audio",
                    "payload": payloads,
                    "width": None,
                    "height": None,
                    "duration_ms": durations,
                }
            )

    return docs.select("doc_id", "text").mapInPandas(gen, MEDIA_SCHEMA)


def audio_stats(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL audio decoding over mapInPandas: header-parsed sample
    rate/count plus RMS amplitude from the PCM samples themselves."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [decode_wav(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "sample_rate": [r[0] for r in rows],
                    "n_samples": [r[1] for r in rows],
                    "rms": [r[2] for r in rows],
                }
            )

    return media.filter(F.col("media_type") == "audio").mapInPandas(run, AUDIO_STATS_SCHEMA)


FRAME_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("mean_y", IntegerType(), True),  # floor of frame luma mean
    ]
)


def encode_y4m(width: int, height: int, frames: list) -> bytes:
    """Raw YUV4MPEG2 (C420): 'YUV4MPEG2 W H F C420\\n' + per frame 'FRAME\\n' +
    Y (w*h) + U + V (w*h/4 each) planes — uncompressed raw video, the third
    codec-free format. Dims must be even (4:2:0 chroma)."""
    if width % 2 or height % 2:
        raise ValueError("C420 needs even dimensions")
    plane = width * height + 2 * (width * height // 4)
    out = [b"YUV4MPEG2 W%d H%d F25:1 C420\n" % (width, height)]
    for fr in frames:
        if len(fr) != plane:
            raise ValueError(f"need {plane} YUV bytes per frame, got {len(fr)}")
        out.append(b"FRAME\n")
        out.append(fr)
    return b"".join(out)


def decode_y4m_frames(payload: bytes) -> list:
    """REAL decode of a y4m stream: [(frame_idx, width, height, mean_luma)] with
    the luma mean floored to int, computed over each frame's Y plane."""
    import numpy as np

    if not payload or not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    nl = payload.index(b"\n")
    w = h = None
    for tok in payload[:nl].split()[1:]:
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
    if not w or not h:
        raise ValueError("missing W/H in y4m header")
    ysize, frame_size = w * h, w * h + 2 * (w * h // 4)
    pos, idx, out = nl + 1, 0, []
    while pos < len(payload):
        if payload[pos : pos + 6] != b"FRAME\n":
            raise ValueError(f"expected FRAME marker at byte {pos}")
        pos += 6
        if pos + frame_size > len(payload):
            raise ValueError("truncated frame (Y or chroma planes incomplete)")
        y = np.frombuffer(payload[pos : pos + ysize], dtype=np.uint8)
        out.append((idx, w, h, int(y.mean())))
        pos += frame_size
        idx += 1
    return out


def attach_y4m_media(docs: DataFrame) -> DataFrame:
    """Synthesize VALID multi-frame y4m clips deterministically from each
    document (even dims + frame count from doc_id, planes by cycling md5(text))
    — real raw video for the real frame decoder, generated worker-side."""
    import hashlib

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, widths, heights, durations = [], [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                w, h = int(doc_id) % 3 * 2 + 4, int(doc_id) % 2 * 2 + 2
                n_frames = int(doc_id) % 4 + 1
                plane = w * h + 2 * (w * h // 4)
                seed = hashlib.md5((text or "").encode()).digest()
                stream = (seed * (plane * n_frames // len(seed) + 1))[: plane * n_frames]
                frames = [stream[f * plane : (f + 1) * plane] for f in range(n_frames)]
                payloads.append(encode_y4m(w, h, frames))
                widths.append(w)
                heights.append(h)
                durations.append(n_frames * 40)  # 25 fps
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": "video",
                    "payload": payloads,
                    "width": widths,
                    "height": heights,
                    "duration_ms": durations,
                }
            )

    return docs.select("doc_id", "text").mapInPandas(gen, MEDIA_SCHEMA)


def frame_luma_stats(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL video frame sampling over mapInPandas: each clip fans
    out to one row per frame with the frame's luma mean — the frame-level
    explode the stubbed `frame_sample_plan` only modeled, now decoding real
    bytes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ws, hs, ys = [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for idx, w, h, mean_y in decode_y4m_frames(payload):
                    ids.append(doc_id)
                    idxs.append(idx)
                    ws.append(w)
                    hs.append(h)
                    ys.append(mean_y)
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "width": ws, "height": hs, "mean_y": ys}
            )

    return media.filter(F.col("media_type") == "video").mapInPandas(run, FRAME_STATS_SCHEMA)


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
