"""Multimodal column plumbing: image/audio/video as opaque `binary`
columns with typed metadata.

The Spark-side machinery (schemas, Arrow batch shapes, mapInPandas
partitioning) is real and tested; the actual media decoding is STUBBED
(`decode_image_stub`) because codec libraries are not in this
container — swap `_decode_image_impl` for a real decoder (PIL/ffmpeg)
on a production cluster without touching the plumbing.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = (
    "media_id long, width int, height int, n_channels int, "
    "sha256 string, feature array<float>"
)


def _decode_image_impl(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """STUB decoder: deterministic fake derived from payload bytes.

    Replace with a real decoder on clusters that ship PIL/opencv:
        from PIL import Image; img = Image.open(io.BytesIO(payload))
    The signature (w, h, c, float32 feature vector) is the contract.
    """
    if payload is None or len(payload) < 8:
        raise NotImplementedError("real image decoding needs PIL/opencv")
    w, h = struct.unpack("<II", payload[:8])
    digest = hashlib.sha256(payload).digest()
    feat = (np.frombuffer(digest, np.uint8)[:16].astype(np.float32) / 255.0)
    return int(w), int(h), 3, feat


def extract_image_features(media: DataFrame, batch_hint: int = 256) -> DataFrame:
    """mapInPandas over binary payloads → typed feature rows.

    Arrow moves the binary batches; numpy does the work; output rows
    align 1:1 with input (flatMap shape proven by tests)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "width": [], "height": [],
                    "n_channels": [], "sha256": [], "feature": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, c, feat = _decode_image_impl(bytes(payload)) if payload is not None else (0, 0, 0, np.zeros(16, np.float32))
                rows["media_id"].append(mid)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_channels"].append(c)
                rows["sha256"].append(hashlib.sha256(bytes(payload)).hexdigest() if payload is not None else None)
                rows["feature"].append(feat.tolist())
            yield pd.DataFrame(rows)

    return media.filter(F.col("kind") == "image").mapInPandas(
        fn, schema=IMAGE_FEATURES_SCHEMA
    )


AUDIO_FEATURES_SCHEMA = (
    "media_id long, duration_ms int, sample_rate int, sha256 string, "
    "mfcc_stub array<float>"
)


def extract_audio_features(media: DataFrame) -> DataFrame:
    """Audio twin of extract_image_features: Arrow batches of binary
    payloads → typed feature rows. The DECODER is stubbed (duration
    faked from payload length at a nominal bitrate; MFCC vector derived
    deterministically from the digest) — swap `_audio_impl` for
    soundfile/librosa on a cluster that ships them; schema, batching
    and partitioning are the real contract."""

    def _audio_impl(payload: bytes) -> tuple[int, int, np.ndarray]:
        digest = hashlib.sha256(payload).digest()
        dur_ms = len(payload) * 8 // 16  # nominal 16 kbit/s stub
        mfcc = np.frombuffer(digest, np.uint8)[:13].astype(np.float32) / 255.0
        return dur_ms, 16000, mfcc

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "duration_ms": [], "sample_rate": [],
                    "sha256": [], "mfcc_stub": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                dur, sr, mfcc = _audio_impl(b)
                rows["media_id"].append(mid)
                rows["duration_ms"].append(dur)
                rows["sample_rate"].append(sr)
                rows["sha256"].append(hashlib.sha256(b).hexdigest())
                rows["mfcc_stub"].append(mfcc.tolist())
            yield pd.DataFrame(rows)

    return media.filter(F.col("kind") == "audio").mapInPandas(
        fn, schema=AUDIO_FEATURES_SCHEMA
    )


def resize_image_plan(media: DataFrame, max_dim: int = 256) -> DataFrame:
    """Resize *plan*: target dimensions per image (aspect-preserving
    clamp to max_dim), computed from the stub header — pure column
    expressions; the pixel resample itself belongs in the (stubbed)
    decoder. Output: (media_id, width, height, target_w, target_h)."""
    img = media.filter(F.col("kind") == "image")
    # stub header: little-endian u32 width/height in payload[0:8]
    def _u32le(off: int):
        b = [F.conv(F.hex(F.substring("payload", off + i, 1)), 16, 10)
             .cast("long") for i in range(1, 5)]
        return b[0] + b[1] * 256 + b[2] * 65536 + b[3] * 16777216

    w, h = _u32le(0), _u32le(4)
    scale = F.least(
        F.lit(1.0), F.lit(float(max_dim)) / F.greatest(w, h).cast("double")
    )
    return img.select(
        "media_id",
        w.cast("int").alias("width"),
        h.cast("int").alias("height"),
        F.ceil(w * scale).cast("int").alias("target_w"),
        F.ceil(h * scale).cast("int").alias("target_h"),
    )


def frame_sample_plan(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame
    index (decode stubbed — frame count faked from payload length).
    Real impl swaps the count expression for ffprobe metadata."""
    n_frames = (F.length("payload") / 1000).cast("int") + 1
    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))).alias("frame_idx"))
    )


def synth_media_df(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for plumbing tests."""
    rows = []
    for i in range(n):
        w, h = 64 + (i % 8) * 16, 48 + (i % 5) * 16
        payload = struct.pack("<II", w, h) + bytes([(i * 7 + j) % 256 for j in range(120)])
        kind = ["image", "image", "audio", "video"][i % 4]
        rows.append((i, kind, bytearray(payload), f"application/x-fake-{kind}"))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
