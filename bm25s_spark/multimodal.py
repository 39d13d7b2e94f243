"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed in Arrow-batched ``mapInPandas``.

The decode step itself is STUBBED (the image/audio codec libraries are
not available in this container): ``decoder="fake"`` produces
deterministic features derived from the bytes, ``decoder="pillow"`` /
``"librosa"`` raise ``NotImplementedError`` with a clear message unless
the library imports.  Everything Spark-side — schema, batching,
partition sizing, UDF signatures — is real and tested, so swapping in a
real codec is a one-function change on the executors.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType, StringType,
    StructField, StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),        # image | audio | video
    StructField("mime", StringType(), False),
    StructField("payload", BinaryType(), False),     # opaque bytes
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("duration_ms", IntegerType(), True),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),
    StructField("n_bytes", IntegerType(), False),
    StructField("digest", StringType(), False),
    StructField("feature", ArrayType(FloatType()), False),
])


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded pseudo-random
    bytes) for exercising the plumbing."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    mimes = {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(rng.integers(0, 256, size=128 + (i % 64), dtype=np.uint8))
        rows.append((
            i, kind, mimes[kind], payload,
            64 + i % 32 if kind == "image" else None,
            48 + i % 16 if kind == "image" else None,
            1000 + 10 * i if kind != "image" else None,
        ))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a real decoder: feature = normalized
    byte histogram folded to ``dim`` (stable across runs/partitions)."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr % dim, minlength=dim).astype(np.float32)
    norm = float(np.linalg.norm(hist)) or 1.0
    return hist / norm


def _resolve_decoder(decoder: str, dim: int):
    if decoder == "fake":
        return lambda payload, kind: _fake_decode(payload, dim)
    if decoder == "pillow":
        try:
            from PIL import Image  # noqa: F401
        except ImportError as exc:
            raise NotImplementedError(
                "pillow is not installed in this environment; use "
                "decoder='fake' (the Spark plumbing is identical)."
            ) from exc
        raise NotImplementedError("real image decode path is stubbed in this build")
    if decoder == "librosa":
        raise NotImplementedError(
            "audio decode is stubbed in this environment; use decoder='fake'."
        )
    raise ValueError(f"unknown decoder {decoder!r}")


def extract_features(media_df: DataFrame, dim: int = 32,
                     decoder: str = "fake") -> DataFrame:
    """binary payloads → fixed-dim float features via Arrow-batched
    ``mapInPandas`` (one decoder instance per task, vectorized batches —
    the shape a real CPU/GPU decode stage takes)."""
    decoder_name, dim_l = decoder, dim

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = _resolve_decoder(decoder_name, dim_l)
        for pdf in batches:
            feats = [
                decode(p, k).tolist()
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(len).astype("int32"),
                "digest": pdf["payload"].map(
                    lambda b: hashlib.md5(b).hexdigest()
                ),
                "feature": feats,
            })

    cols = ["media_id", "kind", "payload"]
    return media_df.select(*cols).mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(media_df: DataFrame, every_ms: int = 500) -> DataFrame:
    """Video frame-sampling *plan* (timestamps to decode) as pure column
    arithmetic — the real decode consumes this plan inside the same
    mapInPandas pattern as ``extract_features``."""
    return (
        media_df.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )
