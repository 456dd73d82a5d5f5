"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as `binary` columns with a
typed metadata struct; decode / feature-extract / resize / frame-sample
run as Arrow-batched UDFs over `mapInPandas`.  The decode step itself is
STUBBED in this container (no image/audio libraries): `decode_image`
raises `NotImplementedError` unless `fake=True`, in which case a
deterministic hash-derived feature vector stands in — the Spark-side
plumbing (schema, batch shape, partitioning, UDF signature) is real and
tested; swapping in PIL/torchaudio later only changes `_decode_one`.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), True),
        StructField("meta", StructType([
            StructField("width", IntegerType(), True),
            StructField("height", IntegerType(), True),
            StructField("duration_ms", IntegerType(), True),
            StructField("mime", StringType(), True),
        ]), True),
    ]
)

FEATURE_DIM = 64

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("media_type", StringType(), False),
        StructField("n_bytes", IntegerType(), False),
        StructField("features", ArrayType(FloatType()), False),
    ]
)


def _decode_one(payload: bytes, media_type: str, fake: bool) -> np.ndarray:
    if not fake:
        raise NotImplementedError(
            "real decode requires PIL/torchaudio — not available in this "
            "container; pass fake=True for the deterministic stand-in"
        )
    # deterministic fake: hash-expanded pseudo-features
    h = hashlib.sha256(payload or b"").digest()
    seed = int.from_bytes(h[:8], "big") % (2**32)
    rs = np.random.RandomState(seed)
    return rs.normal(size=FEATURE_DIM).astype(np.float32)


def extract_media_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """(media_id, media_type, n_bytes, features[64]) via one Arrow pass."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, mtype, payload in zip(
                pdf["media_id"], pdf["media_type"], pdf["payload"]
            ):
                payload = bytes(payload) if payload is not None else b""
                feats = _decode_one(payload, mtype, fake)
                rows.append((mid, mtype, len(payload), feats.tolist()))
            yield pd.DataFrame(
                rows, columns=["media_id", "media_type", "n_bytes", "features"]
            )

    return media.select("media_id", "media_type", "payload").mapInPandas(
        run, schema=FEATURES_SCHEMA
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per planned frame timestamp —
    pure column math (`sequence`), the decode of each frame is the
    stubbed step."""
    dur = F.coalesce(F.col("meta.duration_ms"), F.lit(0))
    return (
        media.where(F.col("media_type") == "video")
        .select(
            "media_id",
            F.explode(
                F.when(dur > 0, F.sequence(F.lit(0), dur - 1, F.lit(every_ms)))
                .otherwise(F.array().cast("array<int>"))
            ).alias("frame_ts_ms"),
        )
    )


def synth_media(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests/benchmarks."""
    rows = []
    for i in range(n):
        h = hashlib.md5(f"{seed}|media|{i}".encode()).digest()
        mtype = ["image", "audio", "video"][i % 3]
        meta = (
            (64 + h[0], 64 + h[1], None, "image/png")
            if mtype == "image"
            else (None, None, 1000 * (1 + h[2] % 10), f"{mtype}/bin")
        )
        rows.append((f"m{i}", mtype, h * 4, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
