"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The reference rasterizes PDF pages to grayscale pixmaps and runs
image-quality kernels on them (quality_analysis_updated/
universal_analyzer.py:37-39 raster scan; metrics/*.py pixel kernels).
This sandbox has no imaging libraries, so — per the build brief — the
DECODE step is stubbed (deterministic fake, clearly marked), while all the
Spark-side plumbing is real and tested:

- schema: ``media`` = binary payload + struct metadata
  (media_type/width/height/duration_ms/codec);
- partition-friendly batch iteration via ``mapInPandas`` (streamed Arrow
  batches: payloads never concatenate into one driver-side blob — at
  100 TB each batch holds a bounded number of binary cells);
- per-modality dispatch (image -> feature vector, audio -> frame
  energies, video -> sampled frame features);
- downstream ops are ordinary columns (the feature vector feeds the
  similarity operators unchanged).

Swap ``_fake_decode_*`` with real decoders (cv2/PIL/ffmpeg) on a cluster
with the libs installed; signatures and schemas stay fixed.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType, BinaryType, DoubleType, IntegerType, LongType, StringType,
    StructField, StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("media_type", StringType(), False),   # image|audio|video
    StructField("payload", BinaryType(), False),      # opaque encoded bytes
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("duration_ms", IntegerType(), True),
    StructField("codec", StringType(), True),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("media_type", StringType(), False),
    StructField("n_bytes", IntegerType(), False),
    StructField("features", ArrayType(DoubleType(), False), False),
    StructField("decode_ok", StringType(), False),
])

N_FEATURES = 16


def _fake_decode_image(payload: bytes) -> np.ndarray:
    """STUB — deterministic fake decoder (no imaging libs in sandbox).

    Real implementation: cv2.imdecode -> grayscale -> resize -> the
    reference's metric kernels. The fake derives a reproducible
    pseudo-pixel block from the payload hash so plumbing tests have
    stable values.
    """
    h = hashlib.sha256(payload).digest() * 2
    return np.frombuffer(h[:N_FEATURES * 4], dtype=np.uint8) \
             .reshape(N_FEATURES, 4).astype(np.float64)


def _fake_decode_audio(payload: bytes) -> np.ndarray:
    """STUB — frame-energy analog; real impl: ffmpeg/soundfile frames."""
    h = hashlib.sha256(b"audio" + payload).digest() * 2
    return np.frombuffer(h[:N_FEATURES * 4], dtype=np.uint8) \
             .reshape(N_FEATURES, 4).astype(np.float64)


def _fake_decode_video(payload: bytes) -> np.ndarray:
    """STUB — frame-sampled features; real impl: ffmpeg keyframe sample."""
    h = hashlib.sha256(b"video" + payload).digest() * 2
    return np.frombuffer(h[:N_FEATURES * 4], dtype=np.uint8) \
             .reshape(N_FEATURES, 4).astype(np.float64)


_DECODERS = {"image": _fake_decode_image, "audio": _fake_decode_audio,
             "video": _fake_decode_video}


def extract_media_features(df: DataFrame) -> DataFrame:
    """media rows -> per-item feature vectors via mapInPandas.

    mapInPandas (not a scalar UDF) so each Arrow batch is processed as a
    stream: binary payloads are released batch-by-batch instead of
    accumulating per-column, which bounds worker memory when payloads are
    MBs each. Output rows are narrow (features only) — the binary never
    travels further down the plan.
    """
    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            oks = []
            for mt, payload in zip(pdf["media_type"], pdf["payload"]):
                decoder = _DECODERS.get(mt)
                if decoder is None or payload is None:
                    feats.append([0.0] * N_FEATURES)
                    oks.append("unsupported")
                    continue
                try:
                    block = decoder(bytes(payload))
                    # per-row feature: mean over the block's columns
                    feats.append((block.mean(axis=1) / 255.0).tolist())
                    oks.append("ok")
                except NotImplementedError:
                    feats.append([0.0] * N_FEATURES)
                    oks.append("decoder_unavailable")
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "n_bytes": pdf["payload"].map(
                    lambda b: len(b) if b is not None else 0),
                "features": feats,
                "decode_ok": oks,
            })

    return df.mapInPandas(process, schema=FEATURE_SCHEMA)


def synthesize_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table (hash-driven payload bytes)."""
    rows = []
    types = ("image", "audio", "video")
    for i in range(n):
        h = hashlib.md5(f"{seed}|media|{i}".encode()).digest()
        mt = types[i % 3]
        payload = (h * ((i % 7) + 1))[: 16 + (i % 50) * 8]
        rows.append((i, mt, bytearray(payload),
                     64 + i % 512 if mt != "audio" else None,
                     64 + (i * 3) % 512 if mt != "audio" else None,
                     1000 * (1 + i % 30) if mt != "image" else None,
                     {"image": "png", "audio": "opus", "video": "av1"}[mt]))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
