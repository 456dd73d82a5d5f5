"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as `binary` columns with a
typed metadata struct; decode / feature-extract / resize / frame-sample
run as Arrow-batched UDFs over `mapInPandas`.

Decode status: binary **PPM (P6)** images are decoded for REAL by a
vendored dependency-free parser (`_decode_ppm`) — header parse, raw RGB
plane, 4×4-grid per-channel sums + 16-bin grayscale histogram as the
feature vector (integer-valued, so float32 carries them exactly).  Other
formats still need PIL/torchaudio (absent in this container): they raise
`NotImplementedError` unless `fake=True`, in which case a deterministic
hash-derived vector stands in.  The Spark-side plumbing (schema, batch
shape, partitioning, UDF signature) is identical for both paths.
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


import re as _re

_PPM_HEADER = _re.compile(rb"^P6\s+(\d+)\s+(\d+)\s+(\d+)\s")


def _decode_ppm(payload: bytes) -> np.ndarray:
    """Real decode of a binary PPM (P6): 64 integer-valued features =
    4×4 grid × RGB per-channel pixel sums (48) + 16-bin grayscale
    histogram (16).  Pure numpy, no imaging library."""
    m = _PPM_HEADER.match(payload)
    if m is None:
        raise ValueError("not a binary PPM (P6) payload")
    w, h, maxv = (int(m.group(k)) for k in (1, 2, 3))
    if maxv > 255:
        raise ValueError("16-bit PPM not supported")
    n = w * h * 3
    data = payload[m.end() : m.end() + n]
    if len(data) < n:
        raise ValueError("truncated PPM pixel data")
    arr = np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)
    feats = np.zeros(FEATURE_DIM, dtype=np.float32)
    row_b = [round(i * h / 4) for i in range(5)]
    col_b = [round(j * w / 4) for j in range(5)]
    k = 0
    for i in range(4):
        for j in range(4):
            block = arr[row_b[i]:row_b[i + 1], col_b[j]:col_b[j + 1]]
            sums = block.reshape(-1, 3).sum(axis=0) if block.size else np.zeros(3)
            feats[k:k + 3] = sums
            k += 3
    gray = arr.astype(np.int64).sum(axis=2) // 3
    hist = np.bincount((gray // 16).ravel(), minlength=16)[:16]
    feats[48:64] = hist
    return feats


def _decode_one(payload: bytes, media_type: str, fake: bool) -> np.ndarray:
    if media_type == "image" and payload[:2] == b"P6":
        return _decode_ppm(payload)  # real decode, no stub
    if not fake:
        raise NotImplementedError(
            "real decode beyond PPM requires PIL/torchaudio — not available "
            "in this container; pass fake=True for the deterministic stand-in"
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


#: dimensions of the synthetic PPM images
PPM_W, PPM_H = 8, 8


def synth_ppm_payload(seed: int, i: int) -> bytes:
    """Deterministic 8×8 binary PPM: md5-stream pixel bytes."""
    pix = b""
    k = 0
    while len(pix) < PPM_W * PPM_H * 3:
        pix += hashlib.md5(f"{seed}|px|{i}|{k}".encode()).digest()
        k += 1
    pix = pix[: PPM_W * PPM_H * 3]
    return b"P6\n%d %d\n255\n" % (PPM_W, PPM_H) + pix


def synth_media(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests/benchmarks.  Image rows
    carry REAL binary-PPM payloads (decoded for real by `_decode_ppm`);
    audio/video payloads stay opaque hash bytes behind the fake path."""
    rows = []
    for i in range(n):
        h = hashlib.md5(f"{seed}|media|{i}".encode()).digest()
        mtype = ["image", "audio", "video"][i % 3]
        if mtype == "image":
            meta = (PPM_W, PPM_H, None, "image/x-portable-pixmap")
            payload = synth_ppm_payload(seed, i)
        else:
            meta = (None, None, 1000 * (1 + h[2] % 10), f"{mtype}/bin")
            payload = h * 4
        rows.append((f"m{i}", mtype, payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
