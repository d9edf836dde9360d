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
    # Summed L1 delta of (hub, auth) at the last iteration — always a
    # finite number (iteration 1 is measured against the uniform start
    # vectors), in both tol-driven and fixed-round (tol=0.0) modes.
    delta: float


def _normalized(df: DataFrame, col: str) -> DataFrame:
    """Divide ``col`` by its global sum — a grouping-free partial agg
    joined back as a 1-row broadcast scalar (the same in-plan pattern
    pagerank uses for the dangling mass, pagerank.py:548)."""
    total = df.agg(F.sum(col).alias("s"))
    return df.crossJoin(F.broadcast(total)).select(
        "vertex", (F.col(col) / F.col("s")).alias(col)
    )


def _l1_delta(cur: DataFrame, prev: DataFrame, col: str) -> DataFrame:
    """Per-row |cur - prev| of ``col`` over a full-outer vertex join
    (vertices absent from one side count their full mass)."""
    return (
        cur.join(
            prev.select("vertex", F.col(col).alias("_p")), "vertex", "full_outer"
        )
        .select(
            F.abs(
                F.coalesce(col, F.lit(0.0)) - F.coalesce("_p", F.lit(0.0))
            ).alias("dd")
        )
    )


def hits(
    edges: DataFrame,
    max_iter: int = 30,
    tol: float = 1e-8,
    checkpoint_every: int = 1,
) -> HitsResult:
    """(vertex, hub, authority), L1-normalized, over the DIRECTED
    distinct edge set of ``edges``.

    ``tol=0.0`` runs exactly ``max_iter`` rounds (the oracle-comparison
    mode, mirroring pagerank's fixed-superstep contract); otherwise the
    loop stops when the summed L1 delta of both vectors ≤ tol.

    ``checkpoint_every`` defaults to 1 (eager state materialization
    every round): each unchecked round multiplies the plan ~4×, and the
    optimizer cost of a 4^k-subtree plan dwarfs the O(|V|) checkpoint
    write even on tiny graphs — raise it only after measuring.
    """
    if max_iter < 1:
        raise ValueError(f"max_iter must be >= 1, got {max_iter}")
    if checkpoint_every < 1:
        raise ValueError(
            f"checkpoint_every must be >= 1, got {checkpoint_every} "
            "(1 = checkpoint every round; there is no 'off' setting — "
            "the lineage grows ~4x per round unchecked)"
        )
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
        # uniform authority start — only the iteration-1 delta baseline
        auth = vertices.select("vertex", F.lit(1.0 / n).alias("authority"))
        it = 0
        delta = float("inf")
        while it < max_iter:
            it += 1
            prev_hub, prev_auth = hub, auth
            # Each half-step references the previous state twice (the
            # gather + _normalized's crossJoin reads its input twice),
            # so an unchecked lineage grows ~4× per round — keep
            # ``checkpoint_every`` small.  State is O(|V|) and eagerly
            # checkpointed every ``checkpoint_every`` rounds, plus
            # whenever a delta job is about to read it (tol-driven
            # rounds and the final round).
            want_delta = tol > 0.0 or it == max_iter
            # r6: materialize each half-step's GATHER (the real work)
            # once — _normalized reads its input twice (total agg +
            # crossJoin), so the un-materialized gather was recomputed
            # per branch (measured as the 97-task broadcast-build jobs
            # re-running the join+agg every round).  The normalized
            # state is then a flat projection over the cached gather
            # (division by the broadcast total, same algebra and the
            # same aggregation partitions — values bit-identical), so
            # it needs no checkpoint of its own and lineage stays O(1).
            ga = (
                e.join(hub.withColumnRenamed("vertex", "src"), "src")
                .groupBy(F.col("dst").alias("vertex"))
                .agg(F.sum("hub").alias("authority"))
                .localCheckpoint(eager=True)
            )
            auth = _normalized(ga, "authority")
            # hub half-step: gather the fresh authority mass back to src
            gh = (
                e.join(auth.withColumnRenamed("vertex", "dst"), "dst")
                .groupBy(F.col("src").alias("vertex"))
                .agg(F.sum("authority").alias("hub"))
                .localCheckpoint(eager=True)
            )
            hub = _normalized(gh, "hub")
            if want_delta:
                # materialize the division so the delta job reads cached
                # rows and the RETURNED plan stays free of the 1-row
                # crossJoin (the hygiene sweep bans BNLJ nodes)
                auth = auth.localCheckpoint(eager=True)
                hub = hub.localCheckpoint(eager=True)
            if want_delta:
                d = (
                    _l1_delta(hub, prev_hub, "hub")
                    .unionByName(_l1_delta(auth, prev_auth, "authority"))
                    .agg(F.sum("dd").alias("d"))
                    .collect()[0]["d"]
                )
                delta = float(d or 0.0)
                if tol > 0.0 and delta <= tol:
                    break
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
