"""Multimodal (image/audio/video) column plumbing.

Media is modeled as opaque ``binary`` payload columns plus typed
metadata — the schema a 100 TB training-data lake actually uses
(parquet binary + sidecar metadata, partitioned by modality/shard).
The Spark-side plumbing (schemas, mapInPandas batch iteration, Arrow
batch shapes, partitioning) is real and tested; the codec step is a
clearly-marked deterministic FAKE because no image/audio libraries
exist in this container — swap ``_fake_decode`` for PIL/ffmpeg in a
real deployment, the operator contract is unchanged.

``mapInPandas`` is the right vehicle: Arrow-batched (no per-row
pickling), streaming iterator (a batch of decoded frames never has to
fit in memory all at once), and output cardinality may differ from
input (frame sampling explodes, filtering contracts).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
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

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)

FRAMES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_bytes", BinaryType(), True),
    ]
)

_FEATURE_DIM = 8


def _fake_decode(payload: bytes) -> list[float]:
    """DETERMINISTIC FAKE decode -> feature vector.

    Real implementation: PIL.Image.open / torchaudio.load / ffmpeg —
    unavailable in this container. The fake derives a stable
    8-float vector from sha256(payload) so tests are reproducible and
    the Arrow plumbing is exercised with realistic shapes.
    """
    if payload is None:
        raise NotImplementedError("real codec required for NULL-payload recovery")
    h = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in h[:_FEATURE_DIM]]


def extract_features(media: DataFrame) -> DataFrame:
    """binary payload -> fixed-dim feature vector, Arrow-batched."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else None),
                    "feature": pdf["payload"].map(
                        lambda b: _fake_decode(b) if b is not None else None
                    ),
                }
            )

    return media.mapInPandas(_batches, schema=FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """video payload -> sampled frame rows (1:N fan-out).

    The fake emits one pseudo-frame per `every_ms` of duration, each a
    sha256-derived byte string; a real build decodes with ffmpeg at
    the same fan-out.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {"media_id": [], "frame_idx": [], "frame_bytes": []}
            for _, row in pdf.iterrows():
                if row["modality"] != "video" or row["payload"] is None:
                    continue
                n_frames = max(1, int((row["duration_ms"] or 0) // every_ms))
                for i in range(n_frames):
                    out["media_id"].append(row["media_id"])
                    out["frame_idx"].append(i)
                    out["frame_bytes"].append(
                        hashlib.sha256(bytes(row["payload"]) + i.to_bytes(4, "big")).digest()
                    )
            yield pd.DataFrame(out)

    return media.mapInPandas(_batches, schema=FRAMES_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize operator — contract only; requires a real codec."""
    raise NotImplementedError(
        "image resize requires PIL/opencv (not in container); "
        "plumbing path: mapInPandas over MEDIA_SCHEMA -> MEDIA_SCHEMA with "
        "payload re-encoded at (width, height)"
    )


def synthetic_media(spark, docs: DataFrame) -> DataFrame:
    """Build a deterministic media table from documents (test fixture):
    payload = utf-8 bytes of text, modality round-robins by doc_id."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("modality"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(64).alias("width"),
        F.lit(64).alias("height"),
        (F.col("n_chars") * 100).cast("long").alias("duration_ms"),
    )
