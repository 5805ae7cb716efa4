"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side plumbing (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested; the actual media decode is STUBBED — the
decode libraries (PIL/ffmpeg/librosa) are not installed in this container.
`deterministic_fake=True` substitutes a seeded, content-derived fake
feature vector so pipelines are testable end-to-end; `False` raises
NotImplementedError at the decode boundary, marking exactly where a real
decoder plugs in.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),  # opaque bytes
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_DIM = 32

_FEATURES_SCHEMA = (
    "media_id string, kind string, n_bytes long, feature array<float>"
)


def _fake_feature(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for a decoded-media feature vector: bytes of
    repeated sha256 stretched to `dim` floats in [-1, 1)."""
    out = b""
    seed = payload or b""
    while len(out) < dim:
        seed = hashlib.sha256(seed).digest()
        out += seed
    a = np.frombuffer(out[:dim], dtype=np.uint8).astype(np.float32)
    return (a - 128.0) / 128.0


def _fake_feature_hexhash(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Portable-oracle variant of `_fake_feature`: identical stretch/scale,
    but the hash chain is seeded with the UPPERCASE hex encoding of the
    payload (a valid VARCHAR) instead of the raw bytes, because the DuckDB
    build in the correctness harness (v1.0.0) only exposes
    sha256(VARCHAR) — no BLOB overload. The raw-bytes path stays the
    library default; this one backs the hash-verified driver entry (same
    precedent as extras/dedup.simhash64_md5_hex)."""
    out = b""
    seed = (payload or b"").hex().upper().encode("ascii")
    while len(out) < dim:
        seed = hashlib.sha256(seed).digest()
        out += seed
    a = np.frombuffer(out[:dim], dtype=np.uint8).astype(np.float32)
    return (a - 128.0) / 128.0


def extract_features(
    media: DataFrame, deterministic_fake: bool = True, hex_hash: bool = False
) -> DataFrame:
    """Decode + feature-extract as an Arrow-batched mapInPandas stage.
    Batch shape: payload arrives as bytes objects; features leave as
    list[float32] -> array<float> (the same column type the ANN operators
    consume). `hex_hash=True` selects the SQL-portable fake-feature
    variant (see `_fake_feature_hexhash`)."""

    fake = _fake_feature_hexhash if hex_hash else _fake_feature

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "media decode stub: install a decoder (PIL/ffmpeg) and "
                    "replace _fake_feature with a real decode at this exact "
                    "batch boundary"
                )
            feats = [
                fake(p if p is not None else b"").tolist()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=_FEATURES_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: expand each video row into frame
    timestamps (native sequence/explode — no Python); the per-frame decode
    would attach via extract_features on the exploded rows."""
    vids = media.filter(F.col("kind") == "video").filter(
        F.col("duration_ms").isNotNull()
    )
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0).cast("long"), F.col("duration_ms"), F.lit(every_ms).cast("long")
            )
        ).alias("frame_ts_ms"),
    )


def multimodal_features_sql(n: int = 64) -> str:
    """DuckDB oracle for the driver's `multimodal_features` entry:
    reconstructs `synth_media(n)` payloads symbolically (digest-hex
    strings — DuckDB v1.0.0 cannot hash BLOBs) and reproduces the
    hex-hash fake feature. feature_sum values are exact multiples of
    1/128 with |sum| < 32, so the double sums are bit-exact on both
    engines and round(x, 6) agrees."""
    return f"""
WITH m AS (
  SELECT i,
    printf('m%05d', i) AS media_id,
    CASE i % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
    upper(repeat(sha256(i::VARCHAR), 1 + i % 5)) AS payload_hex
  FROM range({n}) t(i)
), d AS (
  SELECT media_id, kind,
         length(payload_hex) // 2 AS n_bytes,
         sha256(payload_hex) AS h
  FROM m
)
SELECT media_id, kind, n_bytes,
  round(list_sum(list_transform(range(0, {FEATURE_DIM}), j ->
    (CAST((strpos('0123456789abcdef', substr(h, 2*j + 1, 1)) - 1) * 16
        + strpos('0123456789abcdef', substr(h, 2*j + 2, 1)) - 1 AS DOUBLE)
     - 128.0) / 128.0
  )), 6) AS feature_sum
FROM d
ORDER BY media_id
"""


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests."""
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        payload = hashlib.sha256(str(i).encode()).digest() * (1 + i % 5)
        rows.append(
            (
                f"m{i:05d}",
                kind,
                bytearray(payload),
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64 if kind != "audio" else None,
                48 if kind != "audio" else None,
                5000 + i * 100 if kind == "video" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
