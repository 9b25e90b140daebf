"""Multimodal column plumbing (graft-added surface).

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages. The image/audio codec libraries are
NOT in this container, so the decode core is STUBBED: with
``fake_decode=True`` (default here) a deterministic synthesized array
stands in for the decoded media, keeping the Spark-side plumbing — schema,
partitioning, UDF signature, batch shape — real and testable. Installing a
codec and flipping ``fake_decode=False`` raises NotImplementedError at the
clearly marked point below until a real decoder is wired in.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, StringType, StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("kind", StringType()),          # image | audio | video
        StructField("payload", BinaryType()),        # opaque encoded bytes
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("sample_rate", IntegerType()),
    ]
)


def _fake_decode(payload: bytes, n: int) -> np.ndarray:
    """Deterministic stand-in for a codec: a seeded PRNG keyed by the
    payload bytes. Same payload -> same 'pixels', so tests are stable."""
    seed = np.frombuffer((payload or b"\0")[:8].ljust(8, b"\0"), dtype=np.uint64)[0]
    rng = np.random.default_rng(int(seed))
    return rng.random(n, dtype=np.float64).astype(np.float32)


def image_features(
    df: DataFrame,
    out_dim: int = 64,
    fake_decode: bool = True,
    batch_limit: int = 256,
) -> DataFrame:
    """payload -> decoded pixels -> pooled feature vector.
    mapInPandas: each Arrow batch decodes <=batch_limit media items and
    emits (media_id, features:array<float>)."""

    out_schema = "media_id string, features array<float>"

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_limit):
                chunk = pdf.iloc[start : start + batch_limit]
                feats = []
                for _, row in chunk.iterrows():
                    n_px = max(int(row.get("width") or 8) * int(row.get("height") or 8), out_dim)
                    if fake_decode:
                        px = _fake_decode(row["payload"], n_px)
                    else:
                        # --- REAL DECODER GOES HERE (PIL/libvips/ffmpeg) ---
                        raise NotImplementedError(
                            "real image decode requires a codec library not "
                            "present in this environment"
                        )
                    # mean-pool to fixed dim (the 'feature extraction' stage)
                    trim = (len(px) // out_dim) * out_dim
                    feats.append(px[:trim].reshape(out_dim, -1).mean(axis=1))
                yield pd.DataFrame(
                    {"media_id": chunk["media_id"].values, "features": feats}
                )

    return df.mapInPandas(decode_batches, schema=out_schema)


def frame_sample(
    df: DataFrame,
    every_n: int = 10,
    fake_decode: bool = True,
) -> DataFrame:
    """video payload -> one row per sampled frame index (frame decode
    stubbed identically)."""
    out_schema = "media_id string, frame_idx int, frame_feature float"

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "frame_feature": []}
            for _, row in pdf.iterrows():
                n = int(row.get("n_frames") or 0)
                for idx in range(0, n, every_n):
                    if fake_decode:
                        val = float(_fake_decode(row["payload"], idx + 1)[-1])
                    else:
                        raise NotImplementedError("real frame decode not available")
                    rows["media_id"].append(row["media_id"])
                    rows["frame_idx"].append(idx)
                    rows["frame_feature"].append(val)
            yield pd.DataFrame(rows)

    return df.mapInPandas(sample, schema=out_schema)


def gen_fake_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fixture in MEDIA_SCHEMA shape."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        rows.append(
            (
                f"m{i:05d}", kind, rng.bytes(128),
                int(rng.integers(8, 65)), int(rng.integers(8, 65)),
                int(rng.integers(1, 120)) if kind == "video" else 0,
                16000 if kind == "audio" else 0,
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
