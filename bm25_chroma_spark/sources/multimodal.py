"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with decode / feature-extract / resize / frame-sample
plumbing over mapInPandas.

The actual media codecs (PIL/ffmpeg/librosa) are NOT available in
this environment, so the decode kernels are STUBS: either a
deterministic fake (for the synthetic fixture format below) or a
clearly marked NotImplementedError. Everything Spark-side — schemas,
partitioning, Arrow batch shapes, UDF signatures — is real and
tested, so swapping in a real codec is a one-function change.

Synthetic fixture format ("RAW1"): a self-describing byte layout
  b"RAW1" | u16 width | u16 height | width*height bytes (grayscale)
generated deterministically so resize/feature kernels have real math
to do without external libs.
"""

from __future__ import annotations

import struct
from typing import Iterator, List

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image|audio|video
        StructField("mime", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
        StructField("payload", BinaryType(), False),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("features", ArrayType(FloatType()), False),
    ]
)

MAGIC = b"RAW1"


def encode_raw1(arr: np.ndarray) -> bytes:
    h, w = arr.shape
    return MAGIC + struct.pack("<HH", w, h) + arr.astype(np.uint8).tobytes()


def decode_raw1(payload: bytes) -> np.ndarray:
    """Decode the synthetic RAW1 grayscale format. Real formats (JPEG,
    PNG, WAV, ...) raise: the codec libraries are not present in this
    environment — replace this dispatch with PIL/ffmpeg in production.
    """
    if payload[:4] != MAGIC:
        raise NotImplementedError(
            "non-RAW1 media decoding requires PIL/ffmpeg (not available "
            "in this environment); plug a real codec into decode_raw1"
        )
    w, h = struct.unpack("<HH", payload[4:8])
    return np.frombuffer(payload[8:8 + w * h], dtype=np.uint8).reshape(h, w)


def synth_media(spark: SparkSession, n: int, seed: int = 42,
                partitions: int = 4) -> DataFrame:
    """Deterministic synthetic media table (RAW1 grayscale images)."""
    ids = spark.range(0, n, 1, partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                rng = np.random.RandomState((seed << 20) ^ int(i))
                w, h = int(rng.randint(8, 64)), int(rng.randint(8, 64))
                img = rng.randint(0, 256, size=(h, w), dtype=np.uint8)
                rows.append(
                    {
                        "media_id": int(i),
                        "kind": "image",
                        "mime": "image/x-raw1",
                        "width": w,
                        "height": h,
                        "duration_ms": None,
                        "payload": encode_raw1(img),
                    }
                )
            yield pd.DataFrame(rows)

    return ids.mapInPandas(gen, schema=MEDIA_SCHEMA)


def resize_images(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize inside mapInPandas (numpy only).

    Output keeps MEDIA_SCHEMA; width/height reflect the new size. The
    Arrow batch boundary is the unit of work — no per-row Python at
    the Spark API level.
    """

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            payloads, ws, hs = [], [], []
            for p in pdf["payload"]:
                img = decode_raw1(bytes(p))
                ys = (np.arange(out_h) * img.shape[0] // out_h)
                xs = (np.arange(out_w) * img.shape[1] // out_w)
                resized = img[np.ix_(ys, xs)]
                payloads.append(encode_raw1(resized))
                ws.append(out_w)
                hs.append(out_h)
            out["payload"] = payloads
            out["width"] = ws
            out["height"] = hs
            yield out

    return media.mapInPandas(work, schema=MEDIA_SCHEMA)


def extract_features(media: DataFrame, bins: int = 16) -> DataFrame:
    """Grayscale histogram features (a stand-in for a real vision
    encoder) -> FEATURES_SCHEMA."""

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                img = decode_raw1(bytes(p))
                hist, _ = np.histogram(img, bins=bins, range=(0, 256))
                feats = (hist / max(img.size, 1)).astype(np.float32)
                rows.append(
                    {"media_id": int(mid), "features": feats.tolist()}
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(work, schema=FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling — signature + plan shape only. Raises at
    execution: no video codec in this environment (STUB)."""

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for _pdf in batches:
            raise NotImplementedError(
                "video frame sampling requires ffmpeg (not available); "
                "the mapInPandas plumbing and schema are in place"
            )
            yield  # pragma: no cover

    return media.filter(F.col("kind") == "video").mapInPandas(
        work, schema=MEDIA_SCHEMA
    )
