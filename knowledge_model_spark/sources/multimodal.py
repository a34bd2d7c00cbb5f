"""Multimodal columns: opaque binary payloads + typed metadata.

North-star extension (no analog in the reference beyond PDF bytes on
disk): image/audio/video travel as ``binary`` columns with typed
metadata; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas functions over ``mapInPandas``.

The actual codec libraries (Pillow/ffmpeg/librosa) are NOT in this
container, so the decode kernels are stubbed: ``decode=DETERMINISTIC``
derives reproducible pseudo-features from the payload bytes (so the
Spark-side plumbing — schema, batching, partitioning — is fully real
and tested), and ``decode=REAL`` raises NotImplementedError at the
point where a codec would run.

Scale notes: binary payloads dominate row size → ``maxRecordsPerBatch``
must be kept small for these stages (set per-call, not globally), and
repartitioning before mapInPandas spreads decode cost evenly; payloads
never hit the driver.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_DIM = 16

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)

FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("frame_ts_ms", T.LongType()),
        T.StructField("frame_payload", T.BinaryType()),
    ]
)


def _stub_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic pseudo-embedding of a binary payload: sha256-seeded
    byte statistics.  Stands in for a real image encoder."""
    digest = hashlib.sha256(payload or b"").digest()
    raw = np.frombuffer((digest * ((dim * 4) // len(digest) + 1))[: dim * 4], dtype=np.uint32)
    vec = (raw.astype(np.float64) / np.iinfo(np.uint32).max).astype(np.float32)
    n = float(np.linalg.norm(vec))
    return vec / n if n else vec


def image_features(media: DataFrame, decode: str = "DETERMINISTIC") -> DataFrame:
    """media(media_id, payload, width, height, …) → per-image features.

    REAL mode is the seam where PIL/torchvision would decode; the
    surrounding plan (Arrow batching, schema, partition parallelism) is
    identical in both modes.
    """
    if decode not in ("DETERMINISTIC", "REAL"):
        raise ValueError("decode must be DETERMINISTIC or REAL")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "REAL":
                raise NotImplementedError(
                    "real image decode requires Pillow/torchvision (not in container)"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pdf["width"].fillna(0).astype("int32"),
                    "height": pdf["height"].fillna(0).astype("int32"),
                    "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                    "features": pdf["payload"].map(
                        lambda b: _stub_features(b).tolist()
                    ),
                }
            )

    cols = ["media_id", "payload", "width", "height"]
    return media.select(*cols).mapInPandas(kernel, IMAGE_FEATURES_SCHEMA)


def sample_frames(
    media: DataFrame, every_ms: int = 1000, decode: str = "DETERMINISTIC"
) -> DataFrame:
    """video rows → one row per sampled frame (1-to-N mapInPandas).

    DETERMINISTIC mode slices the payload bytes per frame index so batch
    shapes and row explosion are real; REAL mode is the ffmpeg seam.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [],
                "frame_index": [],
                "frame_ts_ms": [],
                "frame_payload": [],
            }
            for _, row in pdf.iterrows():
                if decode == "REAL":
                    raise NotImplementedError(
                        "real frame sampling requires ffmpeg (not in container)"
                    )
                duration = int(row["duration_ms"] or 0)
                payload = row["payload"] or b""
                n_frames = max(1, duration // every_ms)
                step = max(1, len(payload) // n_frames) if payload else 1
                for i in range(n_frames):
                    out["media_id"].append(row["media_id"])
                    out["frame_index"].append(i)
                    out["frame_ts_ms"].append(i * every_ms)
                    out["frame_payload"].append(payload[i * step : (i + 1) * step])
            yield pd.DataFrame(out)

    cols = ["media_id", "payload", "duration_ms"]
    return media.select(*cols).mapInPandas(kernel, FRAME_SAMPLE_SCHEMA)


AUDIO_WINDOWS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("window_index", T.IntegerType()),
        T.StructField("start_ms", T.LongType()),
        T.StructField("rms", T.FloatType()),
        T.StructField("zero_crossings", T.IntegerType()),
    ]
)


def audio_features(
    media: DataFrame, window_ms: int = 500, decode: str = "DETERMINISTIC"
) -> DataFrame:
    """audio rows → one row per analysis window with waveform statistics
    (RMS energy, zero-crossing count) — the 1-to-N windowed shape every
    audio featurizer (VAD, language-ID, loudness normalization) uses.

    DETERMINISTIC mode treats the payload bytes as an int8 waveform
    sliced into ``window_ms`` windows scaled by ``duration_ms``, so batch
    shapes, explosion factors, and numeric kernels are real; REAL mode is
    the librosa/ffmpeg seam (not in this container).
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [],
                "window_index": [],
                "start_ms": [],
                "rms": [],
                "zero_crossings": [],
            }
            for _, row in pdf.iterrows():
                if decode == "REAL":
                    raise NotImplementedError(
                        "real audio decode requires librosa/ffmpeg (not in container)"
                    )
                duration = int(row["duration_ms"] or 0)
                wave = np.frombuffer(row["payload"] or b"", dtype=np.int8).astype(
                    np.float32
                )
                n_win = max(1, duration // window_ms)
                step = max(1, len(wave) // n_win) if len(wave) else 1
                for i in range(n_win):
                    w = wave[i * step : (i + 1) * step]
                    rms = float(np.sqrt(np.mean(w**2))) if len(w) else 0.0
                    zc = int(((w[:-1] * w[1:]) < 0).sum()) if len(w) > 1 else 0
                    out["media_id"].append(row["media_id"])
                    out["window_index"].append(i)
                    out["start_ms"].append(i * window_ms)
                    out["rms"].append(rms)
                    out["zero_crossings"].append(zc)
            yield pd.DataFrame(out)

    cols = ["media_id", "payload", "duration_ms"]
    return media.select(*cols).mapInPandas(kernel, AUDIO_WINDOWS_SCHEMA)


def make_synthetic_media(spark, n: int = 64, kind: str = "image") -> DataFrame:
    """Deterministic synthetic media table for tests (payload bytes derive
    from media_id)."""
    rows = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.sha2(F.col("id").cast("string"), 256).cast("binary").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        (F.pmod(F.col("id"), F.lit(4)) * 160 + 320).cast("int").alias("width"),
        (F.pmod(F.col("id"), F.lit(3)) * 120 + 240).cast("int").alias("height"),
        (F.pmod(F.col("id"), F.lit(7)) * 1000 + 3000).alias("duration_ms"),
        F.create_map(F.lit("src"), F.lit("synthetic")).alias("meta"),
    )
    return rows
