"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with a typed metadata struct alongside
(SURVEY/BASELINE north-star). The Spark-side plumbing — schemas, batching,
partition sizing, mapInPandas signatures — is real and tested; the actual
codec calls are STUBBED (the runtime has no image/audio libraries): decode
raises NotImplementedError unless ``fake=True`` produces deterministic
synthetic features (so pipelines are testable end-to-end).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_type", StringType()),   # image/jpeg, audio/wav, ...
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)


def attach_media_meta(df: DataFrame, blob_col: str, media_type: str) -> DataFrame:
    """Add a typed metadata struct inferred cheaply from the blob header
    (here: only sizes; real header sniffing plugs in at the marked stub)."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("n_channels"),
            F.lit(None).cast("int").alias("duration_ms"),
        ),
    )


def _fake_features(blob: bytes, dim: int) -> np.ndarray:
    """Deterministic pseudo-features from the blob digest (stand-in for a
    real encoder; stable across runs and machines)."""
    h = hashlib.sha256(blob).digest()
    seed = int.from_bytes(h[:8], "big") % (2**32)
    rng = np.random.RandomState(seed)
    return rng.rand(dim).astype(np.float32)


def extract_features(
    df: DataFrame, blob_col: str, dim: int = 16, fake: bool = False
) -> DataFrame:
    """blob -> float feature vector via Arrow-batched mapInPandas.

    STUB: with fake=False this raises NotImplementedError at execution time —
    the decode step needs an image/audio library not present in this runtime.
    The distributed plumbing (schema, batch iteration, partition mapping) is
    the real implementation a codec drops into."""
    out_schema = StructType(
        df.schema.fields + [StructField("features", ArrayType(FloatType()))]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media decode requires an image/audio codec library; "
                    "install one and replace _fake_features"
                )
            pdf = pdf.copy()
            pdf["features"] = [
                None if b is None else _fake_features(bytes(b), dim)
                for b in pdf[blob_col]
            ]
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def sample_frames(
    df: DataFrame, blob_col: str, every_ms: int = 1000, fake: bool = False
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame (posexplode
    pattern). STUB decode; fake mode emits digest-derived frame blobs."""
    out_schema = StructType(
        [f for f in df.schema.fields]
        + [StructField("frame_index", IntegerType()), StructField("frame", BinaryType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                blob = row[blob_col]
                if blob is None:
                    continue
                if not fake:
                    raise NotImplementedError(
                        "video decode requires a codec library not present here"
                    )
                n = 1 + (len(bytes(blob)) % 3)
                for i in range(n):
                    r = dict(row)
                    r["frame_index"] = i
                    r["frame"] = hashlib.sha256(bytes(blob) + bytes([i])).digest()
                    rows.append(r)
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return df.mapInPandas(run, schema=out_schema)


def blob_stats(df: DataFrame, blob_col: str) -> DataFrame:
    """Native (no-UDF) blob statistics: byte length + sha2 digest — the
    always-available part of multimodal hygiene (dedup, size filters)."""
    return df.select(
        "*",
        F.length(F.col(blob_col)).alias("blob_bytes"),
        F.sha2(F.col(blob_col), 256).alias("blob_sha256"),
    )
