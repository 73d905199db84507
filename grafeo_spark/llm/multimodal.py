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
