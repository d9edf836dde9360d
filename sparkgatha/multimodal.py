"""Multimodal column handling — image/audio/video as opaque ``binary``
columns with typed metadata (task brief: multimodal training-data
pipeline plumbing).

The container has no image/audio codecs, so the decode kernels are
STUBBED: ``decode=fake`` produces deterministic synthetic outputs with
the REAL Spark-side plumbing — schemas, Arrow batch shapes, mapInPandas
signatures, partition behavior — all exercised by tests; ``decode=real``
raises NotImplementedError at the exact seam where PIL/ffmpeg decode
would slot in.

Design notes for 100 TB:
  * binary payloads ride in parquet with metadata columns alongside so
    predicate pushdown prunes by (modality, width, dur_s, …) WITHOUT
    touching payload bytes (column pruning skips the blob column);
  * all kernels are Arrow-batched ``mapInPandas`` — one Python worker
    round-trip per batch, never per row;
  * feature extraction emits fixed-size float arrays matching the
    ``embeddings`` fixture shape so downstream kNN/dedup operators
    compose unchanged.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

MEDIA_SCHEMA = (
    "media_id long, modality string, mime string, width int, height int, "
    "dur_s double, payload binary"
)

FEATURE_DIM = 16

DECODED_IMAGE_SCHEMA = "media_id long, width int, height int, pixels binary"
FEATURES_SCHEMA = f"media_id long, feature array<float>"
FRAMES_SCHEMA = "media_id long, frame_idx int, frame binary"


def synth_media(spark: SparkSession, n: int, num_partitions: int = 4) -> DataFrame:
    """Deterministic synthetic media table (payload = seeded bytes)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mods = ["image", "audio", "video"]
        for pdf in batches:
            rows = {k: [] for k in (
                "media_id", "modality", "mime", "width", "height", "dur_s",
                "payload",
            )}
            for i in pdf["id"]:
                i = int(i)
                m = mods[i % 3]
                rng = np.random.default_rng(np.random.PCG64(1000 + i))
                rows["media_id"].append(i)
                rows["modality"].append(m)
                rows["mime"].append(
                    {"image": "image/png", "audio": "audio/wav",
                     "video": "video/mp4"}[m]
                )
                rows["width"].append(16 + i % 32 if m != "audio" else 0)
                rows["height"].append(16 + i % 24 if m != "audio" else 0)
                rows["dur_s"].append(float(i % 30) if m != "image" else 0.0)
                rows["payload"].append(rng.bytes(64 + i % 256))
            yield pd.DataFrame(rows)

    return spark.range(0, n, 1, num_partitions).mapInPandas(
        gen, schema=MEDIA_SCHEMA
    )


def _require_real_codec(what: str):
    raise NotImplementedError(
        f"real {what} decode requires PIL/ffmpeg (absent in this "
        "container) — plug the codec in here; the Spark plumbing around "
        "this seam is real and tested with decode='fake'"
    )


def decode_images(media: DataFrame, decode: str = "fake") -> DataFrame:
    """binary payload → decoded pixel buffer (stub: deterministic bytes
    derived from the payload digest; real: PIL seam)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "real":
                _require_real_codec("image")
            out = {"media_id": [], "width": [], "height": [], "pixels": []}
            for _, r in pdf.iterrows():
                h = hashlib.sha256(bytes(r["payload"])).digest()
                w, ht = int(r["width"]), int(r["height"])
                # deterministic fake decode: tile the digest to w*h bytes
                n = max(w * ht, 1)
                buf = (h * (n // len(h) + 1))[:n]
                out["media_id"].append(r["media_id"])
                out["width"].append(w)
                out["height"].append(ht)
                out["pixels"].append(buf)
            yield pd.DataFrame(out)

    return (
        media.filter(F.col("modality") == "image")
        .select("media_id", "width", "height", "payload")
        .mapInPandas(kernel, schema=DECODED_IMAGE_SCHEMA)
    )


def extract_features(media: DataFrame, decode: str = "fake") -> DataFrame:
    """payload → fixed-dim float feature vector (stub: digest-seeded
    deterministic vector, unit-normalized; real: model-inference seam).

    Output shape matches the embeddings fixture so similarity.ann_topk
    and dedup.q_dedup_embed_cosine compose directly."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "real":
                _require_real_codec("feature extraction")
            ids, feats = [], []
            for _, r in pdf.iterrows():
                h = hashlib.sha256(bytes(r["payload"])).digest()
                rng = np.random.default_rng(
                    np.random.PCG64(int.from_bytes(h[:8], "little"))
                )
                v = rng.standard_normal(FEATURE_DIM).astype(np.float32)
                v /= np.linalg.norm(v) or 1.0
                ids.append(r["media_id"])
                feats.append(v)
            yield pd.DataFrame({"media_id": ids, "feature": feats})

    return media.select("media_id", "payload").mapInPandas(
        kernel, schema=FEATURES_SCHEMA
    )


def sample_frames(
    media: DataFrame, every_s: float = 1.0, decode: str = "fake"
) -> DataFrame:
    """video → frame rows (1 row → many; stub emits digest-derived frame
    tokens at the real cadence math; real: ffmpeg seam)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "real":
                _require_real_codec("video frame sampling")
            out = {"media_id": [], "frame_idx": [], "frame": []}
            for _, r in pdf.iterrows():
                n_frames = int(float(r["dur_s"]) / every_s)
                h = hashlib.sha256(bytes(r["payload"])).digest()
                for k in range(n_frames):
                    out["media_id"].append(r["media_id"])
                    out["frame_idx"].append(k)
                    out["frame"].append(
                        hashlib.sha256(h + k.to_bytes(4, "little")).digest()
                    )
            yield pd.DataFrame(out)

    return (
        media.filter(F.col("modality") == "video")
        .select("media_id", "dur_s", "payload")
        .mapInPandas(kernel, schema=FRAMES_SCHEMA)
    )
