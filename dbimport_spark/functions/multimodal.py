"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

The decode/resize/frame-sample kernels would use PIL/librosa/av — none of
which are in this container. The DECODE STEP IS STUBBED (clearly marked:
``decode=`fake``` produces deterministic pseudo-features from a content
hash; ``decode=`strict``` raises NotImplementedError). Everything around
it — schema, partition sizing, UDF signature, batch shape — is the real
production plumbing and is tested.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),  # image|audio|video
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16


def _fake_features(content: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for a real decoder+encoder: dim floats in
    [-1, 1) derived from the sha256 of the content. NOT a real model —
    exists so the distributed plumbing is testable in this container."""
    out = []
    h = content or b""
    for i in range(dim):
        d = hashlib.sha256(h + i.to_bytes(2, "big")).digest()
        out.append(int.from_bytes(d[:8], "big", signed=True) / float(2**63))
    return out


def extract_media_features(
    media: DataFrame,
    decode: str = "fake",
    batch_target_bytes: int = 64 << 20,
) -> DataFrame:
    """binary content → (media_id, n_bytes, content_sha256, features).

    Arrow-batched; one task per input partition. Size input partitions so
    a batch of blobs fits executor memory (``batch_target_bytes`` is the
    guide for the caller's repartitioning — blobs are NOT splittable).
    """
    if decode == "strict":
        raise NotImplementedError(
            "real image/audio decode needs PIL/librosa/av — not in this container"
        )
    if decode != "fake":
        raise ValueError(f"unknown decode mode {decode!r}")

    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            feats = [_fake_features(c if c is not None else b"") for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [len(c) if c is not None else 0 for c in pdf["content"]],
                    "content_sha256": [
                        hashlib.sha256(c if c is not None else b"").hexdigest()
                        for c in pdf["content"]
                    ],
                    "features": feats,
                }
            )

    return media.select("media_id", "content").mapInPandas(
        kernel,
        "media_id bigint, n_bytes bigint, content_sha256 string, features array<double>",
    )


def sample_frames(
    media: DataFrame,
    n_frames: int = 4,
) -> DataFrame:
    """'Video' frame sampling stub: split the binary payload into n_frames
    evenly-spaced slices (deterministic stand-in for real keyframe
    extraction; the explode/row-shape matches the real thing)."""
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                data = content if content is not None else b""
                step = max(1, len(data) // n_frames)
                for i in range(n_frames):
                    chunk = data[i * step : (i + 1) * step]
                    rows.append(
                        {
                            "media_id": mid,
                            "frame_idx": i,
                            "frame_sha256": hashlib.sha256(chunk).hexdigest(),
                            "frame_bytes": len(chunk),
                        }
                    )
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_sha256", "frame_bytes"])

    return media.select("media_id", "content").mapInPandas(
        kernel, "media_id bigint, frame_idx int, frame_sha256 string, frame_bytes bigint"
    )


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Adapter used by tests/queries: treat document text bytes as an
    opaque binary payload with fabricated metadata."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.lit("image").alias("media_type"),
        F.struct(
            F.lit(64).cast("int").alias("width"),
            F.lit(64).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.lit("fake").alias("codec"),
        ).alias("meta"),
    )
