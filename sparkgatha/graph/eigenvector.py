"""Eigenvector centrality as (A + I) power-iteration supersteps
(SURVEY.md §2.11 G26).

The third classical centrality beside PageRank (volume) and HITS
(directed hub/authority factorization): the principal eigenvector of
the adjacency matrix, i.e. a vertex matters in proportion to how much
its neighbors matter.  Semantics follow ``networkx.eigenvector_
centrality`` exactly — the iterate is x ← (A + I)·x (the +I shift is
what NetworkX runs; it kills the period-2 oscillation a bipartite
component would otherwise never converge out of) — but normalized L1
(sum-to-one) per round instead of NetworkX's L2, for the same reason
HITS is (graph/hits.py): every quantity stays a partial-aggregable
SUM, expressible in the unrolled DuckDB oracle without sqrt
round-trip noise.  Scalar normalization never changes the iterate's
DIRECTION, so after k rounds the L1 and L2 runs are the same vector
up to one global constant — the converged direction is the principal
eigenvector either way, and the golden test rescales to L2 before
comparing with NetworkX.

Physical shape: the (A + I) matrix is literally the deduplicated edge
set UNION one unit self-loop row per vertex, built and cached ONCE —
each superstep is then exactly one keyed join (state ⋈ edges) plus one
partial-aggregable groupBy, with the global norm folded in as a 1-row
broadcast scalar (the pagerank dangling-mass pattern).  The self-loop
rows also guarantee every vertex survives every round (no left-join
resurrection pass needed).  State is O(|V|), eagerly checkpointed on
the ``checkpoint_every`` cadence; the edge table never moves after the
initial cache.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from sparkgatha.graph.hits import _l1_delta, _normalized
from sparkgatha.util import no_aqe


@dataclass(frozen=True)
class EigenvectorResult:
    scores: DataFrame  # (vertex, score), L1-normalized (sums to 1)
    iterations: int
    # Summed L1 delta at the last iteration (iteration 1 is measured
    # against the uniform start vector) — finite in both modes.
    delta: float


def eigenvector_centrality(
    edges: DataFrame,
    max_iter: int = 50,
    tol: float = 1e-8,
    checkpoint_every: int = 1,
    weighted: bool = True,
) -> EigenvectorResult:
    """(vertex, score) — L1-normalized (A + I) power iteration over the
    directed adjacency rows of ``edges`` (pass both orientations for an
    undirected graph, the convention every operator here shares).

    ``tol=0.0`` runs exactly ``max_iter`` rounds — the oracle-comparison
    mode mirroring pagerank/hits' fixed-superstep contract; otherwise
    the loop stops once the summed L1 delta ≤ tol.  ``weighted=False``
    (or a missing ``weight`` column) scores the simple graph; parallel
    (src, dst) duplicates are weight-summed either way, so the input
    need not be pre-deduplicated.

    Self-loops are KEPT (their weight lands on the diagonal of A and a
    loop-only vertex still gets a row — NetworkX semantics and the
    repo's vertex-coverage rule).  A loop's two orientations coincide,
    so pass each loop ONCE in weighted mode — a blind symmetrize that
    re-emits loops doubles their diagonal weight (simple mode is
    immune: duplicates collapse).
    """
    if max_iter < 1:
        raise ValueError(f"max_iter must be >= 1, got {max_iter}")
    if checkpoint_every < 1:
        raise ValueError(
            f"checkpoint_every must be >= 1, got {checkpoint_every} "
            "(1 = checkpoint every round; there is no 'off' setting)"
        )
    spark = edges.sparkSession
    use_w = weighted and "weight" in edges.columns
    with no_aqe(spark):
        # NetworkX keeps self-loops in A (a loop's weight lands on the
        # diagonal), and the repo's vertex-coverage rule (triangle_
        # profile / neighborhood._prep) says a self-loop-only vertex is
        # a ROW, not an absent row — so no src != dst filter anywhere
        if use_w:
            e = (
                edges.select("src", "dst", F.col("weight").cast("double"))
                .groupBy("src", "dst")
                .agg(F.sum("weight").alias("weight"))
            )
        else:
            # simple graph: duplicates collapse to ONE unit entry, they
            # must not weight-sum
            e = (
                edges.select("src", "dst")
                .distinct()
                .withColumn("weight", F.lit(1.0))
            )
        e = e.localCheckpoint(eager=True)
        vertices = (
            e.select(F.col("src").alias("vertex"))
            .unionByName(e.select(F.col("dst").alias("vertex")))
            .distinct()
            .localCheckpoint(eager=True)
        )
        n = vertices.count()
        if n == 0:
            empty = vertices.select("vertex", F.lit(0.0).alias("score"))
            return EigenvectorResult(scores=empty, iterations=0, delta=0.0)
        # (A + I): the +I term is one unit self-loop row per vertex —
        # the shifted matrix is a plain edge table, so the superstep
        # stays a single join+agg with no separate "carry x over" pass.
        es = e.unionByName(
            vertices.select(
                F.col("vertex").alias("src"),
                F.col("vertex").alias("dst"),
                F.lit(1.0).alias("weight"),
            )
        ).localCheckpoint(eager=True)
        x = vertices.select("vertex", F.lit(1.0 / n).alias("score"))
        it = 0
        delta = float("inf")
        while it < max_iter:
            it += 1
            prev = x
            want_delta = tol > 0.0 or it == max_iter
            # r6: materialize the GATHER once per round — _normalized
            # reads its input twice (total agg + crossJoin), so the
            # un-materialized gather was recomputed per branch (the
            # hits.py finding); the normalized state is then a flat
            # projection over the cached gather, bit-identical values
            gx = (
                es.join(x.withColumnRenamed("vertex", "src"), "src")
                .groupBy(F.col("dst").alias("vertex"))
                .agg(F.sum(F.col("weight") * F.col("score")).alias("score"))
                .localCheckpoint(eager=True)
            )
            x = _normalized(gx, "score")
            if want_delta:
                # materialize the division so the delta job reads cached
                # rows and the RETURNED plan stays free of the 1-row
                # crossJoin (the hygiene sweep bans BNLJ nodes)
                x = x.localCheckpoint(eager=True)
            if want_delta:
                d = (
                    _l1_delta(x, prev, "score")
                    .agg(F.sum("dd").alias("d"))
                    .collect()[0]["d"]
                )
                delta = float(d or 0.0)
                if tol > 0.0 and delta <= tol:
                    break
        return EigenvectorResult(scores=x, iterations=it, delta=delta)
