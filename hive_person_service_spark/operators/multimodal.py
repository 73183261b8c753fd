"""Multimodal-column operators (SURVEY.md §2.J): image/audio/video carried
as opaque BinaryType blobs with typed metadata, processed via Arrow-batched
mapInPandas.

The decode step is STUBBED (no image/audio libraries in this container):
``decode_image_features`` computes a deterministic fake feature vector from
the blob bytes so the Spark-side plumbing -- schema, partitioning, UDF
signature, Arrow batch shape -- is real and tested; swap ``_fake_decode``
for a PIL/libav call in a real deployment. ``resize_images`` raises
NotImplementedError by design.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Schema for a multimodal asset table: opaque payload + typed metadata.
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("blob", BinaryType()),
        StructField("media_type", StringType()),  # image/png, audio/wav, ...
        StructField("width", LongType()),
        StructField("height", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("blob_len", LongType()),
        StructField("feature", ArrayType(DoubleType())),
    ]
)


def documents_as_assets(docs: DataFrame) -> DataFrame:
    """Build a multimodal asset table from the documents fixture: utf-8
    bytes as the blob (stand-in for real media payloads)."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.encode(F.col("text"), "UTF-8").alias("blob"),
        F.lit("text/plain").alias("media_type"),
        F.lit(None).cast("long").alias("width"),
        F.lit(None).cast("long").alias("height"),
    )


def _fake_decode(blob: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in for a real decoder: digest bytes -> unit
    vector. Replace with PIL/torchvision/libav in deployment."""
    h = hashlib.sha256(blob).digest()
    v = np.frombuffer(h[: dim * 4], dtype=np.uint32).astype(np.float64)
    v = v / np.linalg.norm(v)
    return v


def decode_image_features(assets: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over binary blobs. The mapInPandas
    iterator shape streams batches -- constant memory per task regardless of
    partition size, the right contract for 100 MB+ media blobs (pair with
    small files.maxPartitionBytes for blob tables)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf["blob"]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "blob_len": blobs.str.len().astype("int64"),
                    "feature": [list(_fake_decode(b, dim)) for b in blobs],
                }
            )

    return assets.mapInPandas(extract, FEATURE_SCHEMA)


def resize_images(assets: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize -- requires an imaging library not present in this
    container. Deliberately unimplemented (SURVEY/task contract: stub the
    decode, keep the plumbing real)."""
    raise NotImplementedError(
        "resize_images needs an image decoder (PIL/opencv); not available in "
        "this environment. Wire the decoder into decode_image_features-style "
        "mapInPandas when deploying."
    )
