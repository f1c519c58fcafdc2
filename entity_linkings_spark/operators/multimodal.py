"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata, processed through Arrow-batched ``mapInPandas`` plumbing.

The decode step is STUBBED (no image/audio libraries in this container): by
default a deterministic fake derives features from the payload bytes, so the
Spark-side contract — schema, partitioning, UDF signature, batch shape — is
real and tested end-to-end. Passing ``real_decode=True`` raises
NotImplementedError at the exact point a production build would call the
codec (PIL/torchaudio/ffmpeg), marking the swap-in site.

Scale notes: payloads stay opaque to the JVM (binary columns move through
Tungsten untyped); feature extraction is embarrassingly parallel per batch;
frame sampling explodes rows inside ``mapInPandas`` so the expansion never
materializes driver-side.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
        T.StructField("n_bytes", T.IntegerType(), True),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("t_ms", T.IntegerType(), False),
        T.StructField("frame_payload", T.BinaryType(), True),
    ]
)


def synthetic_assets(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic fake assets (payload = md5-stream bytes)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = b"".join(
            hashlib.md5(f"{i}:{j}".encode()).digest() for j in range(8)
        )
        meta = {
            "width": 64 if kind == "image" else None,
            "height": 48 if kind == "image" else None,
            "sample_rate": 16000 if kind == "audio" else None,
            "duration_ms": 4000 if kind in ("audio", "video") else None,
        }
        rows.append((f"asset-{i:04d}", kind, payload, meta))
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def _fake_features(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a decoded-content embedding."""
    h = hashlib.sha256(payload or b"").digest()
    raw = np.frombuffer(h[: FEATURE_DIM * 2], dtype=np.uint16).astype(np.float32)
    return raw / 65535.0


def extract_features(df: DataFrame, real_decode: bool = False) -> DataFrame:
    """mapInPandas feature extraction: one Arrow batch in, one out."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real_decode:
                raise NotImplementedError(
                    "real decode requires image/audio codecs not present in "
                    "this container — swap _fake_features for the codec here"
                )
            feats = [
                _fake_features(p).tolist() if p is not None else None
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "features": feats,
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                }
            )

    return df.mapInPandas(run, FEATURES_SCHEMA)


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Expand video assets into frame rows (deterministic fake frame payloads
    sliced from the source payload); non-video rows produce nothing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"asset_id": [], "frame_idx": [], "t_ms": [], "frame_payload": []}
            vids = pdf[pdf["kind"] == "video"]
            for _, row in vids.iterrows():
                # Arrow structs with nullable int fields surface as floats
                # (NaN for null) in pandas — normalize before range()
                raw = row["meta"]["duration_ms"] if row["meta"] is not None else None
                dur = 0 if raw is None or pd.isna(raw) else int(raw)
                payload = row["payload"] or b""
                for k, t in enumerate(range(0, dur, every_ms)):
                    lo = (k * 16) % max(len(payload), 1)
                    out["asset_id"].append(row["asset_id"])
                    out["frame_idx"].append(k)
                    out["t_ms"].append(t)
                    out["frame_payload"].append(payload[lo : lo + 16])
            yield pd.DataFrame(out)

    return df.mapInPandas(run, FRAME_SCHEMA)
