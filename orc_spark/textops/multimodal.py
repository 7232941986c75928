"""Multimodal (image/audio/video) column plumbing.

Media payloads ride as opaque ``binary`` columns with typed metadata;
the decode / feature-extraction steps run as Arrow-batched
``mapInArrow`` stages. The actual media codecs (PIL/ffmpeg/torchcodec)
are NOT present in this environment, so the decode kernel is STUBBED:
``decode_image_stub`` derives deterministic pseudo-features from the
bytes (documented below). The Spark-side plumbing — schemas, batch
shapes, partitioning, UDF signatures — is real and tested; swapping
the stub for a real decoder is a one-function change.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image|audio|video
        StructField("n_bytes", LongType(), False),
        StructField("sha", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("feature", ArrayType(FloatType()), False),
    ]
)


def media_metadata(df: DataFrame, id_col: str, bytes_col: str, kind: str) -> DataFrame:
    """Typed metadata for an opaque media column — pure JVM expressions
    (length, sha) plus stub header probes."""
    b = F.col(bytes_col)
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit(kind).alias("kind"),
        F.length(b).cast("long").alias("n_bytes"),
        F.sha2(b, 256).alias("sha"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )


def decode_image_stub(data: bytes, dim: int = 16) -> np.ndarray:
    """STUB decoder (no image libs in this container).

    Real implementation would be e.g. PIL.Image.open + resize +
    normalize. The stub produces a deterministic pseudo-feature: the
    byte histogram of sha-seeded samples, L2-normalized — stable,
    content-sensitive, and the right shape for the pipeline.
    """
    if not data:
        return np.zeros(dim, dtype=np.float32)
    h = hashlib.blake2b(data, digest_size=8).digest()
    (seed,) = struct.unpack("<Q", h)
    arr = np.frombuffer(data, dtype=np.uint8)
    hist = np.bincount(arr >> 4, minlength=dim)[:dim].astype(np.float64)
    rng = np.random.default_rng(seed)
    hist = hist + rng.random(dim)  # deterministic tie-break jitter
    norm = np.linalg.norm(hist)
    return (hist / (norm or 1.0)).astype(np.float32)


def extract_features(
    df: DataFrame, id_col: str, bytes_col: str, dim: int = 16
) -> DataFrame:
    """mapInArrow feature extraction over a binary media column.

    Batch shape: input batches of (id, bytes); output batches of
    (media_id, feature array<float>) — the exact plumbing a real
    decoder plugs into (CPU-heavy per row, Arrow in/out).
    """
    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column(id_col)
            blobs = batch.column(bytes_col)
            feats = [
                decode_image_stub(b.as_py() if b.is_valid else b"", dim)
                for b in blobs
            ]
            yield pa.RecordBatch.from_arrays(
                [
                    ids.cast(pa.int64()),
                    pa.array(
                        [f.tolist() for f in feats], type=pa.list_(pa.float32())
                    ),
                ],
                names=["media_id", "feature"],
            )

    return df.select(id_col, bytes_col).mapInArrow(fn, FEATURE_SCHEMA)


def frame_sample_stub(
    df: DataFrame, id_col: str, bytes_col: str, every_ms: int = 1000
) -> DataFrame:
    """Video frame-sampling plumbing (STUB): emits (media_id, frame_idx,
    frame_bytes) rows where frame_bytes is a deterministic slice of the
    source — the explode/repartition shape a real ffmpeg stage needs."""
    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("frame_idx", IntegerType(), False),
            StructField("frame_bytes", BinaryType(), False),
        ]
    )

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids, blobs = batch.column(id_col), batch.column(bytes_col)
            o_ids, o_idx, o_frames = [], [], []
            for i in range(batch.num_rows):
                data = blobs[i].as_py() or b""
                n_frames = max(1, min(8, len(data) // max(every_ms, 1)))
                step = max(1, len(data) // n_frames)
                for k in range(n_frames):
                    o_ids.append(ids[i].as_py())
                    o_idx.append(k)
                    o_frames.append(data[k * step : k * step + 64])
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(o_ids, type=pa.int64()),
                    pa.array(o_idx, type=pa.int32()),
                    pa.array(o_frames, type=pa.binary()),
                ],
                names=["media_id", "frame_idx", "frame_bytes"],
            )

    return df.select(id_col, bytes_col).mapInArrow(fn, out_schema)
