"""G4 — PageRank as DataFrame join+agg supersteps (SURVEY.md §2.11 G4).

Semantics are pinned to ``networkx.pagerank`` (the reference golden per
BASELINE.json: per-vertex scores allclose 1e-6): damping alpha (default
0.85), uniform teleport 1/N, dangling-rank mass redistributed uniformly,
row-stochastic transition = weight / weighted-out-degree, convergence
when the L1 delta < N * tol (NetworkX's stopping rule).  Float64
throughout; fp-addition-order noise across partitionings is absorbed by
the 1e-6 tolerance (SURVEY.md §4.3.4).

Superstep shape (SURVEY.md §3.4) — exactly one action per iteration:

    contrib   = edges_norm ⋈ ranks ON src = vertex      (SMJ/SHJ; the
                edge side is hash-partitioned once by G11 and never
                re-shuffles — only the small rank state moves)
    gathered  = contrib.groupBy(dst).sum                (partial+final agg;
                map-side combine bounds reduce-side skew at sum())
    new_ranks = vertices ⟕ gathered                     (dangling keep mass)
    one collect returns (delta_l1, active, next danglesum) together.

Checkpointing (G12) doubles as lineage truncation so the plan stays O(1)
per superstep; resume continues from the largest complete iteration.

Reference analog: AGATHA itself never runs PageRank — its iterative
analog is PyTorch-BigGraph training over the same graph (out of scope,
SURVEY.md §2.12); the north rule substitutes the four classic link-graph
algorithms over the co-occurrence graph.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

from sparkgatha.graph.checkpoint import CheckpointManager
from sparkgatha.graph.metrics import MetricsSink, partition_fingerprints, state_fingerprint
from sparkgatha.graph.partitioning import layout_edges
from sparkgatha.util import no_aqe


@dataclass
class PageRankResult:
    ranks: DataFrame                      # (vertex long, rank double)
    iterations: int
    converged: bool
    deltas: list[float] = field(default_factory=list)
    superstep_wall_s: list[float] = field(default_factory=list)
    n_vertices: int = 0
    n_edges: int = 0


def _prepare(edges: DataFrame, num_partitions: int):
    """Static per-run tables: normalized edges (G11 layout) + vertex set
    with dangling flags.  Both persisted; edges never re-shuffle."""
    out_w = edges.groupBy("src").agg(F.sum("weight").alias("out_w"))
    edges_norm = (
        edges.join(out_w, "src")
        .select("src", "dst", (F.col("weight") / F.col("out_w")).alias("w"))
    )
    edges_norm = layout_edges(edges_norm, num_partitions, key="src")

    srcs = edges.select(F.col("src").alias("vertex")).distinct()
    vertices = (
        edges.select(F.col("src").alias("vertex"))
        .unionByName(edges.select(F.col("dst").alias("vertex")))
        .distinct()
        .join(srcs.withColumn("_has_out", F.lit(True)), "vertex", "left")
        .select(
            "vertex", F.coalesce(F.col("_has_out"), F.lit(False)).alias("has_out")
        )
        .persist()
    )
    return edges_norm, vertices


def pagerank(
    edges: DataFrame,
    alpha: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
    num_partitions: int = 32,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 1,
    resume: bool = False,
    run_id: str = "pagerank",
    metrics_sink: MetricsSink | None = None,
    with_lineage: bool = False,
) -> PageRankResult:
    """PageRank over directed weighted ``edges(src, dst, weight)``.

    For undirected graphs pass symmetrized edges (extract.symmetrize).
    Stops when delta_l1 < N * tol (NetworkX rule) or at max_iter.
    ``checkpoint_dir`` enables durable per-superstep checkpoints and
    resume; otherwise localCheckpoint truncates lineage only.
    ``with_lineage`` additionally records per-partition shas (slower).
    """
    spark = edges.sparkSession
    ckpt = CheckpointManager(checkpoint_dir, run_id)
    sink = metrics_sink or MetricsSink(checkpoint_dir, run_id)

    with no_aqe(spark):
        return _pagerank_loop(
            spark, edges, alpha, tol, max_iter, num_partitions,
            checkpoint_dir, checkpoint_every, resume, ckpt, sink,
            with_lineage,
        )


def _pagerank_loop(
    spark, edges, alpha, tol, max_iter, num_partitions,
    checkpoint_dir, checkpoint_every, resume, ckpt, sink, with_lineage,
) -> PageRankResult:
    edges_norm, vertices = _prepare(edges, num_partitions)
    n = vertices.count()
    n_edges = edges_norm.count()  # also materializes the layout cache
    if n == 0:
        return PageRankResult(
            spark.createDataFrame([], "vertex long, rank double"), 0, True
        )

    teleport = (1.0 - alpha) / n

    start_it = 0
    deltas: list[float] = []
    walls: list[float] = []
    ranks: DataFrame | None = None
    if resume and checkpoint_dir:
        last = ckpt.latest_complete()
        if last is not None:
            ranks = ckpt.load(spark, last)
            start_it = last
    if ranks is None:
        ranks = vertices.select(
            "vertex", F.lit(1.0 / n).alias("rank"), "has_out"
        ).localCheckpoint(eager=True)

    # danglesum for the upcoming iteration = sum of rank on dangling vertices
    dangle = float(
        ranks.filter(~F.col("has_out")).agg(F.sum("rank")).collect()[0][0] or 0.0
    )

    converged = False
    it = start_it
    while it < max_iter:
        it += 1
        t0 = time.monotonic()

        gathered = (
            edges_norm.join(ranks, edges_norm.src == ranks.vertex)
            .select("dst", (F.col("w") * F.col("rank")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("c"))
        )
        base = alpha * dangle / n + teleport
        new_ranks = (
            vertices.join(gathered, vertices.vertex == gathered.dst, "left")
            .select(
                "vertex",
                (alpha * F.coalesce(F.col("c"), F.lit(0.0)) + F.lit(base)).alias(
                    "rank"
                ),
                "has_out",
            )
        )

        # lazy lineage truncation: the checkpoint materializes inside the
        # stats job below — exactly ONE Spark job per superstep
        next_ranks = new_ranks.localCheckpoint(eager=False)

        # single action: delta-L1 + active count + next danglesum together
        j = next_ranks.alias("nw").join(
            ranks.alias("old").select("vertex", F.col("rank").alias("rank_old")),
            "vertex",
        )
        stats = (
            j.select(
                "vertex",
                F.col("nw.rank").alias("rank"),
                F.col("nw.has_out").alias("has_out"),
                F.abs(F.col("nw.rank") - F.col("rank_old")).alias("d"),
            )
            .agg(
                F.sum("d").alias("delta_l1"),
                F.sum(F.when(F.col("d") > tol, 1).otherwise(0)).alias("active"),
                F.sum(F.when(~F.col("has_out"), F.col("rank")).otherwise(0.0)).alias(
                    "dangle"
                ),
            )
            .collect()[0]
        )
        delta = float(stats["delta_l1"])
        dangle = float(stats["dangle"] or 0.0)
        wall = time.monotonic() - t0

        durable = checkpoint_dir is not None and (
            it % checkpoint_every == 0 or delta < n * tol or it >= max_iter
        )
        if durable:
            sha = state_fingerprint(next_ranks.select("vertex", "rank"))
            parts = partition_fingerprints(next_ranks) if with_lineage else None
            ranks = ckpt.save(
                it,
                next_ranks,
                sha,
                metrics={"delta_l1": delta, "active": int(stats["active"])},
                partitions=parts,
            )
        else:
            sha = ""
            ranks = next_ranks

        deltas.append(delta)
        walls.append(wall)
        sink.record(it, delta, int(stats["active"]), n, wall * 1000.0, sha)

        if delta < n * tol:
            converged = True
            break

    edges_norm.unpersist()
    vertices.unpersist()
    return PageRankResult(
        ranks.select("vertex", "rank"),
        it,
        converged,
        deltas,
        walls,
        n,
        n_edges,
    )
