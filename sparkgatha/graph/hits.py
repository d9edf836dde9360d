"""HITS (Kleinberg hubs & authorities) as fixed-point DataFrame
supersteps (SURVEY.md §2.11).

On the DIRECTED co-occurrence edge set the two scores factor the graph
the way the reference's hypothesis ranker wants: authorities are terms
many hub terms point at.  Semantics: classic unweighted HITS with L1
(sum-to-one) normalization after each half-step —

    auth_k(v) = Σ_{u→v} hub_{k-1}(u)     then auth_k /= Σ auth_k
    hub_k(u)  = Σ_{u→v} auth_k(v)        then hub_k  /= Σ hub_k

L1 normalization (instead of the textbook L2) keeps every quantity a
sum — partial-aggregable in Spark AND expressible in the unrolled
DuckDB oracle without sqrt round-trip noise.  The converged direction
is the same principal eigenvector either way; only the scale constant
differs, and L1 pins it deterministically cross-engine.

Physical shape: the edge set is deduplicated and cached ONCE; each
half-step is one keyed join (state ⋈ edges) plus one partial-aggregable
groupBy, with the two global norm sums folded into the same aggregation
pass as a grouping-free agg over the result (no extra scan).  State is
O(|V|); edges never move after the initial cache.  Lineage is truncated
by a localCheckpoint every ``checkpoint_every`` rounds, else 2·k joins
deep plans choke the optimizer.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from sparkgatha.util import no_aqe


@dataclass(frozen=True)
class HitsResult:
    scores: DataFrame  # (vertex, hub, authority)
    iterations: int
    delta: float  # L1 delta of (hub, auth) at the last iteration


def _normalized(df: DataFrame, col: str) -> DataFrame:
    """Divide ``col`` by its global sum — a grouping-free partial agg
    joined back as a 1-row broadcast scalar (the same in-plan pattern
    pagerank uses for the dangling mass, pagerank.py:548)."""
    total = df.agg(F.sum(col).alias("s"))
    return df.crossJoin(F.broadcast(total)).select(
        "vertex", (F.col(col) / F.col("s")).alias(col)
    )


def hits(
    edges: DataFrame,
    max_iter: int = 30,
    tol: float = 1e-8,
    checkpoint_every: int = 4,
) -> HitsResult:
    """(vertex, hub, authority), L1-normalized, over the DIRECTED
    distinct edge set of ``edges``.

    ``tol=0.0`` runs exactly ``max_iter`` rounds (the oracle-comparison
    mode, mirroring pagerank's fixed-superstep contract); otherwise the
    loop stops when the summed L1 delta of both vectors ≤ tol.
    """
    if max_iter < 1:
        raise ValueError(f"max_iter must be >= 1, got {max_iter}")
    spark = edges.sparkSession
    with no_aqe(spark):
        e = (
            edges.select("src", "dst")
            .filter(F.col("src") != F.col("dst"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        vertices = (
            e.select(F.col("src").alias("vertex"))
            .unionByName(e.select(F.col("dst").alias("vertex")))
            .distinct()
            .localCheckpoint(eager=True)
        )
        n = vertices.count()
        if n == 0:
            empty = vertices.select(
                "vertex", F.lit(0.0).alias("hub"), F.lit(0.0).alias("authority")
            )
            return HitsResult(scores=empty, iterations=0, delta=0.0)
        hub = vertices.select("vertex", F.lit(1.0 / n).alias("hub"))
        auth = None
        prev_hub = prev_auth = None
        it = 0
        delta = float("inf")
        while it < max_iter:
            it += 1
            # authority half-step: gather hub mass along edges into dst.
            # Both half-step results are O(|V|) and eagerly checkpointed
            # EVERY round: each round's plan references the previous
            # state twice (gather + normalize), so an unchecked lineage
            # doubles per round — 2^k subtrees by round k chokes the
            # optimizer long before any data moves.
            auth = _normalized(
                e.join(hub.withColumnRenamed("vertex", "src"), "src")
                .groupBy(F.col("dst").alias("vertex"))
                .agg(F.sum("hub").alias("authority")),
                "authority",
            ).localCheckpoint(eager=True)
            # hub half-step: gather the fresh authority mass back to src
            new_hub = _normalized(
                e.join(auth.withColumnRenamed("vertex", "dst"), "dst")
                .groupBy(F.col("src").alias("vertex"))
                .agg(F.sum("authority").alias("hub")),
                "hub",
            ).localCheckpoint(eager=True)
            if tol > 0.0 and prev_hub is not None:
                d = (
                    new_hub.join(
                        prev_hub.select("vertex", F.col("hub").alias("ph")),
                        "vertex",
                        "full_outer",
                    )
                    .select(
                        F.abs(
                            F.coalesce("hub", F.lit(0.0))
                            - F.coalesce("ph", F.lit(0.0))
                        ).alias("dd")
                    )
                    .unionByName(
                        auth.join(
                            prev_auth.select(
                                "vertex", F.col("authority").alias("pa")
                            ),
                            "vertex",
                            "full_outer",
                        ).select(
                            F.abs(
                                F.coalesce("authority", F.lit(0.0))
                                - F.coalesce("pa", F.lit(0.0))
                            ).alias("dd")
                        )
                    )
                    .agg(F.sum("dd").alias("d"))
                    .collect()[0]["d"]
                )
                delta = float(d or 0.0)
                if delta <= tol:
                    hub = new_hub
                    break
            prev_hub, prev_auth = new_hub, auth
            hub = new_hub
        scores = (
            vertices.join(hub, "vertex", "left")
            .join(auth, "vertex", "left")
            .select(
                "vertex",
                F.coalesce("hub", F.lit(0.0)).alias("hub"),
                F.coalesce("authority", F.lit(0.0)).alias("authority"),
            )
        )
        return HitsResult(scores=scores, iterations=it, delta=delta)
