"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed in Arrow-batched ``mapInPandas``.

Decoders:

- ``decoder="numpy"`` — REAL bytes→tensor decode with no external
  codecs: binary PPM (P6) images and RIFF/WAVE PCM audio are parsed in
  pure NumPy (``decode_ppm`` / ``decode_wav``), features derived from
  the decoded tensors (block-averaged luminance strips / audio energy
  envelope).  Matching encoders generate real fixtures.  Video decode
  stays honestly stubbed (no container/codec library in this
  environment).
- ``decoder="fake"`` — deterministic byte-histogram stand-in for
  payloads with no parseable format (plumbing tests at any scale).
- ``decoder="pillow"`` / ``"librosa"`` raise ``NotImplementedError``
  with a clear message unless the library imports.

Everything Spark-side — schema, batching, partition sizing, UDF
signatures — is identical across decoders, so swapping in a full codec
is a one-function change on the executors.
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


# ---------------------------------------------------------------------------
# pure-NumPy codecs (no external libraries)
# ---------------------------------------------------------------------------

def synthetic_decodable_media(spark, n: int = 32, seed: int = 42) -> DataFrame:
    """Media table whose payloads are REAL encoded bytes (binary PPM
    images, PCM-16 WAV audio) for exercising the numpy decode path
    end-to-end.  Deterministic for a fixed seed."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        if i % 2 == 0:
            h, w = 8 + i % 8, 12 + i % 8
            img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            rows.append((i, "image", "image/x-portable-pixmap",
                         encode_ppm(img), w, h, None))
        else:
            n_samp = 800 + 40 * (i % 16)
            t = np.arange(n_samp) / 16000.0
            samples = 0.5 * np.sin(2 * np.pi * (200 + 10 * i) * t)
            rows.append((i, "audio", "audio/wav",
                         encode_wav(samples), None, None,
                         int(1000 * n_samp / 16000)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary PPM (P6) bytes."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) uint8, got {img.shape}")
    h, w = img.shape[:2]
    return f"P6\n{w} {h}\n255\n".encode("ascii") + img.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) bytes → (h, w, 3) uint8.  Handles the format's
    whitespace/comment grammar; maxval must be ≤ 255."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # the single whitespace byte after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError(f"16-bit PPM (maxval={maxval}) not supported")
    raster = np.frombuffer(payload, dtype=np.uint8, count=h * w * 3, offset=pos)
    return raster.reshape(h, w, 3)


def resize_image(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize, pure NumPy (index-map gather)."""
    h, w = img.shape[:2]
    rows = (np.arange(out_h) * h // out_h).astype(np.int64)
    cols = (np.arange(out_w) * w // out_w).astype(np.int64)
    return img[rows][:, cols]


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """float samples in [-1, 1] → RIFF/WAVE PCM-16 mono bytes."""
    pcm = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    pcm16 = (pcm * 32767.0).astype("<i2")
    data = pcm16.tobytes()
    import struct

    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, 1, sample_rate,
        sample_rate * 2, 2, 16,
    )
    datahdr = struct.pack("<4sI", b"data", len(data))
    riff = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + len(datahdr) + len(data), b"WAVE")
    return riff + fmt + datahdr + data


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE PCM bytes → (sample_rate, float32 samples in [-1, 1]).
    Walks the chunk list (fmt / data may be separated by other chunks);
    PCM-16 and unsigned PCM-8, any channel count (channels averaged)."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, n_channels, bits, data = 12, None, 1, 16, None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack("<4sI", payload[pos : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, n_channels, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if audio_fmt != 1:
                raise ValueError(f"only PCM wav supported (fmt={audio_fmt})")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("wav payload missing fmt/data chunk")
    if bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
    elif bits == 8:
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported PCM width {bits}")
    if n_channels > 1:
        x = x[: len(x) - len(x) % n_channels].reshape(-1, n_channels).mean(axis=1)
    return rate, x


def _image_feature(img: np.ndarray, dim: int) -> np.ndarray:
    """Decoded image → ``dim`` floats: mean luminance of ``dim``
    horizontal strips (every pixel contributes — a single-column sample
    would ignore 1-1/width of the image), deterministic and
    resolution-independent."""
    lum = np.asarray(img, dtype=np.float32).mean(axis=2) / 255.0
    row_means = lum.mean(axis=1)
    h = row_means.shape[0]
    edges = (np.arange(dim + 1) * h // dim).astype(np.int64)
    csum = np.concatenate(([0.0], np.cumsum(row_means, dtype=np.float64)))
    counts = np.maximum(edges[1:] - edges[:-1], 1)
    # strip mean; empty strips (dim > h) repeat the nearest row
    strips = (csum[np.maximum(edges[1:], edges[:-1] + 1)] - csum[edges[:-1]]) / counts
    return strips.astype(np.float32)


def _audio_feature(samples: np.ndarray, dim: int) -> np.ndarray:
    """Decoded samples → ``dim`` floats: RMS energy per equal-width
    frame (the classic envelope feature)."""
    n = len(samples)
    if n == 0:
        return np.zeros(dim, dtype=np.float32)
    edges = (np.arange(dim + 1) * n // dim).astype(np.int64)
    sq = np.concatenate(([0.0], np.cumsum(samples.astype(np.float64) ** 2)))
    counts = np.maximum(edges[1:] - edges[:-1], 1)
    return np.sqrt((sq[edges[1:]] - sq[edges[:-1]]) / counts).astype(np.float32)


def _numpy_decode(payload: bytes, kind: str, dim: int) -> np.ndarray:
    if kind == "image":
        return _image_feature(decode_ppm(payload), dim)
    if kind == "audio":
        _rate, samples = decode_wav(payload)
        return _audio_feature(samples, dim)
    raise NotImplementedError(
        "video decode needs a container/codec library not present in "
        "this environment; use decoder='fake' for video payloads"
    )


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
    if decoder == "numpy":
        return lambda payload, kind: _numpy_decode(payload, kind, dim)
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
