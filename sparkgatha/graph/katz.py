"""Katz centrality as affine power-iteration supersteps (SURVEY.md
§2.11 G30).

The attenuation-based member of the centrality family: a vertex's score
is the weighted count of ALL walks terminating at it, walks of length k
damped by alpha^k —

    x_k(v) = alpha * sum_{(u,v) in E} w(u,v) * x_{k-1}(u) + beta

(``networkx.katz_centrality`` semantics: in-edge gather, x starts at the
zero vector, and the converged vector is reported L2-normalized).
Unlike eigenvector centrality the iterate needs NO per-round
normalization — the +beta offset keeps it bounded whenever
alpha < 1/lambda_max — so every round is a pure affine map and the
whole iteration is expressible in an unrolled DuckDB oracle with zero
scalar subqueries.

Physical shape: the deduplicated edge table is cached once; each
superstep is exactly one keyed join (state |><| edges on src), one
partial-aggregable groupBy(dst) sum, and one |V|-row left join back to
the vertex universe that resurrects in-degree-0 vertices at the beta
floor.  State is O(|V|), eagerly checkpointed on the
``checkpoint_every`` cadence; the edge table never moves after the
initial cache — identical scale shape to pagerank's shuffle strategy,
one join + one agg per superstep over a stationary layout.

Convergence / divergence: the series converges iff
alpha < 1/lambda_max(A).  This engine cannot know lambda_max up front
(computing it IS eigenvector centrality), so like NetworkX the
tol-driven mode RAISES after ``max_iter`` non-converged rounds rather
than returning a silently diverging vector; ``tol=0.0`` runs exactly
``max_iter`` rounds (the fixed-round oracle-comparison mode every
iterative operator here shares).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from sparkgatha.util import no_aqe


@dataclass(frozen=True)
class KatzResult:
    scores: DataFrame  # (vertex, score) — UN-normalized (see katz_l2)
    iterations: int
    # Summed L1 delta at the last iteration (iteration 1 is measured
    # against the zero start vector) — finite in both modes.
    delta: float


def katz_centrality(
    edges: DataFrame,
    alpha: float = 0.1,
    beta: float = 1.0,
    max_iter: int = 100,
    tol: float = 1e-8,
    checkpoint_every: int = 1,
    weighted: bool = True,
) -> KatzResult:
    """(vertex, score) — Katz centrality over the directed adjacency
    rows of ``edges`` (pass both orientations for an undirected graph,
    the convention every operator here shares).

    Scores are returned UN-normalized (the raw fixpoint of
    x = alpha*A^T*x + beta); divide by the L2 norm for NetworkX's
    ``normalized=True`` output — a single global scalar that never
    changes the ranking.  ``tol=0.0`` runs exactly ``max_iter`` rounds
    (the oracle-comparison mode); otherwise the loop stops once the
    summed L1 delta <= tol and RAISES if ``max_iter`` rounds pass
    without converging (alpha too large for this graph's spectral
    radius — the NetworkX PowerIterationFailedConvergence contract;
    returning the diverging vector would be a silently wrong answer).

    ``weighted=False`` (or a missing ``weight`` column) scores the
    simple graph; parallel (src, dst) duplicates are weight-summed
    either way.  Self-loops are kept (diagonal mass, NetworkX
    semantics).
    """
    if max_iter < 1:
        raise ValueError(f"max_iter must be >= 1, got {max_iter}")
    if checkpoint_every < 1:
        raise ValueError(
            f"checkpoint_every must be >= 1, got {checkpoint_every} "
            "(1 = checkpoint every round; there is no 'off' setting)"
        )
    if not alpha > 0.0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    spark = edges.sparkSession
    use_w = weighted and "weight" in edges.columns
    with no_aqe(spark):
        if use_w:
            e = (
                edges.select("src", "dst", F.col("weight").cast("double"))
                .groupBy("src", "dst")
                .agg(F.sum("weight").alias("weight"))
            )
        else:
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
        if vertices.isEmpty():
            empty = vertices.select("vertex", F.lit(0.0).alias("score"))
            return KatzResult(scores=empty, iterations=0, delta=0.0)
        # NetworkX starts from the zero vector, so round 1 lands every
        # vertex exactly at beta — matched here and in the oracle.
        x = vertices.select("vertex", F.lit(0.0).alias("score"))
        it = 0
        delta = float("inf")
        while it < max_iter:
            it += 1
            prev = x
            want_delta = tol > 0.0 or it == max_iter
            do_ckpt = want_delta or it % checkpoint_every == 0
            gathered = (
                e.join(x.withColumnRenamed("vertex", "src"), "src")
                .groupBy(F.col("dst").alias("vertex"))
                .agg(F.sum(F.col("weight") * F.col("score")).alias("g"))
            )
            # the |V|-row resurrection join: in-degree-0 vertices hold
            # the beta floor every round (their walks all have length 0)
            x = vertices.join(gathered, "vertex", "left").select(
                "vertex",
                (
                    F.lit(float(alpha)) * F.coalesce("g", F.lit(0.0))
                    + F.lit(float(beta))
                ).alias("score"),
            )
            if do_ckpt:
                x = x.localCheckpoint(eager=True)
            if want_delta:
                # same full-outer L1 delta hits.py uses — both frames
                # cover the full vertex universe here, the full-outer
                # form is just the shared helper's contract
                from sparkgatha.graph.hits import _l1_delta

                d = (
                    _l1_delta(x, prev, "score")
                    .agg(F.sum("dd").alias("d"))
                    .collect()[0]["d"]
                )
                delta = float(d or 0.0)
                if tol > 0.0 and delta <= tol:
                    return KatzResult(scores=x, iterations=it, delta=delta)
        if tol > 0.0:
            raise RuntimeError(
                f"katz_centrality did not converge within {max_iter} "
                f"iterations (last L1 delta {delta:.3e}); alpha={alpha} "
                "likely exceeds 1/lambda_max for this graph — lower alpha "
                "or raise max_iter"
            )
        return KatzResult(scores=x, iterations=it, delta=delta)


def katz_l2(result: KatzResult) -> DataFrame:
    """(vertex, score) rescaled to unit L2 norm — NetworkX's
    ``normalized=True`` output (one global scalar; ranking unchanged)."""
    x = result.scores
    norm = x.agg(F.sqrt(F.sum(F.col("score") * F.col("score"))).alias("n"))
    return x.crossJoin(F.broadcast(norm)).select(
        "vertex", (F.col("score") / F.col("n")).alias("score")
    )
