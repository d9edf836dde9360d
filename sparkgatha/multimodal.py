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
        # columnar over the Arrow batch: sizes vectorized in numpy; the
        # only per-value work is the digest/tile over the opaque binary
        # payloads (a real codec is inherently per-image at this seam
        # too) — no pandas row iteration
        for pdf in batches:
            if decode == "real":
                _require_real_codec("image")
            sizes = np.maximum(
                pdf["width"].to_numpy(dtype=np.int64)
                * pdf["height"].to_numpy(dtype=np.int64),
                1,
            )
            # deterministic fake decode: tile the digest to w*h bytes
            pixels = [
                (hashlib.sha256(bytes(p)).digest() * (int(n) // 32 + 1))[: int(n)]
                for p, n in zip(pdf["payload"].to_numpy(), sizes)
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "pixels": pixels,
                }
            )

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
        # digest-seeded rows must stay per-row deterministic, so the
        # seeds come from a comprehension over the payload column; the
        # vector math is one batched numpy matrix op — no row iteration
        for pdf in batches:
            if decode == "real":
                _require_real_codec("feature extraction")
            seeds = [
                int.from_bytes(hashlib.sha256(bytes(p)).digest()[:8], "little")
                for p in pdf["payload"].to_numpy()
            ]
            if seeds:
                mat = np.stack(
                    [
                        np.random.default_rng(np.random.PCG64(s)).standard_normal(
                            FEATURE_DIM
                        )
                        for s in seeds
                    ]
                ).astype(np.float32)
                norms = np.linalg.norm(mat, axis=1, keepdims=True)
                mat /= np.where(norms == 0, 1.0, norms)
                feats = list(mat)
            else:
                feats = []
            yield pd.DataFrame({"media_id": pdf["media_id"], "feature": feats})

    return media.select("media_id", "payload").mapInPandas(
        kernel, schema=FEATURES_SCHEMA
    )


def sample_frames(
    media: DataFrame, every_s: float = 1.0, decode: str = "fake"
) -> DataFrame:
    """video → frame rows (1 row → many; stub emits digest-derived frame
    tokens at the real cadence math; real: ffmpeg seam)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # cadence math (frame counts, row expansion) is vectorized
        # numpy (repeat/arange); only the digest runs per payload
        for pdf in batches:
            if decode == "real":
                _require_real_codec("video frame sampling")
            n_frames = (
                pdf["dur_s"].to_numpy(dtype=np.float64) / every_s
            ).astype(np.int64)
            # malformed rows (negative duration) contribute zero frames
            # instead of poisoning np.repeat with a negative count
            n_frames = np.maximum(n_frames, 0)
            if n_frames.sum() == 0:
                yield pd.DataFrame(
                    {"media_id": [], "frame_idx": [], "frame": []}
                ).astype({"media_id": "int64", "frame_idx": "int32"})
                continue
            digests = [
                hashlib.sha256(bytes(p)).digest()
                for p in pdf["payload"].to_numpy()
            ]
            row_idx = np.repeat(np.arange(len(n_frames)), n_frames)
            frame_idx = np.concatenate([np.arange(k) for k in n_frames if k > 0])
            frames = [
                hashlib.sha256(digests[d] + int(k).to_bytes(4, "little")).digest()
                for d, k in zip(row_idx, frame_idx)
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy()[row_idx],
                    "frame_idx": frame_idx.astype(np.int32),
                    "frame": frames,
                }
            )

    return (
        media.filter(F.col("modality") == "video")
        .select("media_id", "dur_s", "payload")
        .mapInPandas(kernel, schema=FRAMES_SCHEMA)
    )


RESIZED_SCHEMA = "media_id long, width int, height int, pixels binary"


def resize_images(
    decoded: DataFrame, target_w: int = 8, target_h: int = 8
) -> DataFrame:
    """Nearest-neighbor resize of decoded pixel buffers — a REAL kernel
    (pure index arithmetic over the byte grid, no codec involved), fully
    vectorized: one numpy fancy-index gather per Arrow batch.  Composes
    after :func:`decode_images`; at 100 TB this is the thumbnailing /
    normalization stage that runs where the decode ran (same partition,
    no shuffle between them)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ty = np.arange(target_h)
        tx = np.arange(target_w)
        for pdf in batches:
            ws = pdf["width"].to_numpy(dtype=np.int64)
            hs = pdf["height"].to_numpy(dtype=np.int64)
            out = []
            for p, w, h in zip(pdf["pixels"].to_numpy(), ws, hs):
                w, h = max(int(w), 1), max(int(h), 1)
                buf = np.frombuffer(bytes(p), dtype=np.uint8)[: w * h]
                if buf.size < w * h:  # defensive: short buffer → pad
                    buf = np.pad(buf, (0, w * h - buf.size))
                grid = buf.reshape(h, w)
                sy = (ty * h) // target_h
                sx = (tx * w) // target_w
                out.append(grid[np.ix_(sy, sx)].tobytes())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": np.full(len(out), target_w, dtype=np.int32),
                    "height": np.full(len(out), target_h, dtype=np.int32),
                    "pixels": out,
                }
            )

    return decoded.select("media_id", "width", "height", "pixels").mapInPandas(
        kernel, schema=RESIZED_SCHEMA
    )
