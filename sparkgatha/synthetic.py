"""Deterministic synthetic graph generator (FIXTURES.md §B: power-law
graph with a designated hub ≈ 30% of edges — the skew stressor and
bench input B).

Generated *distributed*: ``spark.range`` ids seed per-row PRNG streams
(NumPy PCG64, seeded by block), so the same (n_vertices, n_edges, seed)
triple produces identical edges at any partition count, and generation
scales to 10^9+ edges without a driver-side loop — same pattern as
corpus.generate_corpus.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

EDGE_SCHEMA = "src long, dst long, weight double"

_BLOCK = 65536  # rows per deterministic PRNG block


def _make_gen(n_vertices: int, hub_frac: float, seed: int, zipf_s: float):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Zipf-ish vertex sampling via inverse-CDF on a uniform draw:
        # rank r with prob ∝ 1/r^s.  CDF table is built once per worker.
        ranks = np.arange(1, n_vertices + 1, dtype=np.float64)
        probs = 1.0 / ranks**zipf_s
        probs /= probs.sum()
        cdf = np.cumsum(probs)

        for pdf in batches:
            ids = pdf["id"].to_numpy()
            out_src = np.empty(len(ids), dtype=np.int64)
            out_dst = np.empty(len(ids), dtype=np.int64)
            out_w = np.empty(len(ids), dtype=np.float64)
            # process in deterministic blocks keyed by id // _BLOCK so
            # results are independent of partitioning
            pos = 0
            for block in np.unique(ids // _BLOCK):
                mask = (ids // _BLOCK) == block
                bids = ids[mask]
                rng = np.random.default_rng(
                    np.random.PCG64(seed * 1_000_003 + int(block))
                )
                k = _BLOCK  # draw the full block, index by offset
                u1 = rng.random(k)
                u2 = rng.random(k)
                uw = rng.random(k)
                off = (bids % _BLOCK).astype(np.int64)
                src = np.searchsorted(cdf, u1[off])
                dst = np.searchsorted(cdf, u2[off])
                # hub rewiring: the first hub_frac of ids use vertex 0 as src
                is_hub = (bids % 1000) < int(hub_frac * 1000)
                src = np.where(is_hub, 0, src)
                # avoid self-loops deterministically
                dst = np.where(dst == src, (dst + 1) % n_vertices, dst)
                n = len(bids)
                out_src[pos : pos + n] = src
                out_dst[pos : pos + n] = dst
                out_w[pos : pos + n] = uw[off] + 1e-9
                pos += n
            yield pd.DataFrame(
                {"src": out_src, "dst": out_dst, "weight": out_w}
            )

    return gen


def powerlaw_edges(
    spark: SparkSession,
    n_edges: int,
    n_vertices: int | None = None,
    hub_frac: float = 0.3,
    seed: int = 42,
    zipf_s: float = 1.2,
    num_partitions: int = 32,
) -> DataFrame:
    """Directed multigraph edge table (src, dst, weight), deterministic
    for fixed parameters at any partition count.  Vertex 0 is the hub
    (src of ≈ hub_frac of all edges)."""
    if n_vertices is None:
        n_vertices = max(n_edges // 10, 100)
    seeds = spark.range(0, n_edges, 1, num_partitions)
    return seeds.mapInPandas(
        _make_gen(n_vertices, hub_frac, seed, zipf_s), schema=EDGE_SCHEMA
    )
