"""k-core decomposition by synchronous peeling (SURVEY.md §2.11).

The k-core is the maximal subgraph in which every vertex has degree
≥ k within the subgraph — the standard "dense backbone" filter a
literature-graph pipeline runs before expensive downstream ranking
(peripheral one-paper terms drop out; the reference prunes rare terms
the same way before graph construction [P1]).

Algorithm: synchronous peel rounds.  Round i keeps every vertex whose
degree COUNTING ONLY round-(i-1) survivors is ≥ k; iterate to fixpoint.
This is the Montresor-De Pellegrini-Miorandi message-passing scheme
restricted to a single k — each round is

  * one semi-join of the cached edge set against the survivor set on
    BOTH endpoints (sort-merge, keyed, no data-dependent blowup), and
  * one partial-aggregable degree count + threshold filter.

The edge set is filtered IN PLACE each round (surviving edges only),
so at web scale every subsequent round scans a shrinking table, and it
is localCheckpointed per round to truncate lineage.  Convergence = edge
count unchanged: a round drops an edge iff it drops a vertex (every
surviving-edge endpoint has degree ≥ 1, so a removed vertex removes
edges, and an edge is only removed when an endpoint leaves), so an
equal count on the just-checkpointed table IS the fixpoint — no extra
shuffle, no fingerprint.

``max_iter`` semantics: ``None`` (the default) runs to fixpoint — the
exact k-core — with a runaway bound that RAISES rather than silently
returning a partially-peeled graph (a long path at k=2 peels only its
two endpoints per synchronous round, so silent truncation would label
mid-path vertices as core members).  An integer runs AT MOST that many
rounds and stops silently at the bound: the fixed-round oracle mode —
callers comparing against an R-round unrolled SQL peel rely on the
round count being exactly the oracle's when convergence is not reached
earlier (relational.py:q_k_core).

``core_numbers`` runs the peel for k = 1, 2, ... on the previous
core's residual graph (the (k+1)-core is a subgraph of the k-core, so
each pass starts from the already-peeled edge set — total work is the
telescoping sum, not k × full-graph).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from sparkgatha.graph.canon import canonical_undirected
from sparkgatha.util import (
    adaptive_shuffle_partitions,
    no_aqe,
    scoped_shuffle_partitions,
)

# Fixpoint-mode runaway bound: synchronous peeling removes >= 1 vertex
# per non-final round, so this only trips on graphs with >1e6 peel
# waves — at that diameter the synchronous scheme is the wrong tool and
# failing loudly beats burning 2e6 Spark jobs.
_FIXPOINT_ROUND_CAP = 1_000_000


def _peel(e: DataFrame, k: int, max_iter: int | None) -> DataFrame:
    """Iterate the degree-≥-k filter over a checkpointed canonical edge
    set.  ``max_iter=None`` → fixpoint (raises at the runaway cap);
    integer → at most that many rounds, silent stop at the bound (the
    fixed-round oracle mode).  Returns the surviving edge set."""
    strict = max_iter is None
    bound = _FIXPOINT_ROUND_CAP if strict else max_iter
    n_prev = e.count()
    spark = e.sparkSession
    default_p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    converged = n_prev == 0
    for _ in range(bound):
        if converged:
            break
        # r6: size each peel round's exchanges to the surviving edge
        # set (integer degrees + semi-joins, partitioning-independent)
        with scoped_shuffle_partitions(
            spark, adaptive_shuffle_partitions(n_prev, default_p)
        ):
            deg = (
                e.select(F.col("u").alias("x"))
                .unionByName(e.select(F.col("v").alias("x")))
                .groupBy("x")
                .agg(F.count("*").alias("d"))
            )
            keep = deg.filter(F.col("d") >= k).select("x")
            e = (
                e.join(keep.withColumnRenamed("x", "u"), "u", "left_semi")
                .join(keep.withColumnRenamed("x", "v"), "v", "left_semi")
                .select("u", "v")
                .localCheckpoint(eager=True)
            )
            n = e.count()
        converged = n == n_prev
        n_prev = n
    if strict and not converged:
        raise RuntimeError(
            f"k-core peel (k={k}) did not reach fixpoint within "
            f"{_FIXPOINT_ROUND_CAP} synchronous rounds; this graph's peel "
            "diameter is beyond the synchronous scheme — pass an explicit "
            "max_iter to accept a truncated (non-exact) peel"
        )
    return e


def k_core(
    edges: DataFrame,
    k: int,
    max_iter: int | None = None,
    *,
    assume_canonical: bool = False,
) -> DataFrame:
    """(vertex, core_degree): vertices of the k-core with their degree
    inside the core.  Empty result when the k-core is empty.

    ``max_iter=None`` (default) peels to fixpoint — the exact k-core;
    an integer caps the synchronous rounds (fixed-round oracle mode,
    see module docstring).  ``assume_canonical`` skips the
    least/greatest + distinct normalization when the caller's edge set
    is already distinct canonical u < v pairs without self-loops — one
    less full-edge-set shuffle, which matters when the input is the
    10^12-edge table itself.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    spark = edges.sparkSession
    with no_aqe(spark):
        if assume_canonical:
            # trust the caller's edge set (ideally already materialized
            # — a cached/checkpointed table) and skip both the
            # normalization shuffle and the extra materialization
            e = edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        else:
            e = canonical_undirected(edges).localCheckpoint(eager=True)
        e = _peel(e, k, max_iter)
        return (
            e.select(F.col("u").alias("vertex"))
            .unionByName(e.select(F.col("v").alias("vertex")))
            .groupBy("vertex")
            .agg(F.count("*").alias("core_degree"))
        )


def core_numbers(
    edges: DataFrame, max_k: int = 1000, max_iter: int | None = None
) -> DataFrame:
    """(vertex, core): the largest k for which the vertex survives the
    k-core peel — exact (``networkx.core_number`` semantics) with the
    default ``max_iter=None``; an integer ``max_iter`` truncates each
    peel at that round count (non-exact, silent — fixed-round mode).
    Peels k = 1, 2, ... over the telescoping residual graph until it
    empties (or ``max_k``, a runaway bound for degenerate inputs)."""
    spark = edges.sparkSession
    with no_aqe(spark):
        e = canonical_undirected(edges).localCheckpoint(eager=True)
        # every edge endpoint is at least in the 1-core
        labels = (
            e.select(F.col("u").alias("vertex"))
            .unionByName(e.select(F.col("v").alias("vertex")))
            .distinct()
            .select("vertex", F.lit(1).alias("core"))
            .localCheckpoint(eager=True)
        )
        k = 1
        while k < max_k:
            k += 1
            e = _peel(e, k, max_iter)
            survivors = (
                e.select(F.col("u").alias("vertex"))
                .unionByName(e.select(F.col("v").alias("vertex")))
                .distinct()
            )
            if survivors.limit(1).count() == 0:
                break
            labels = (
                labels.join(
                    survivors.select("vertex", F.lit(k).alias("k2")),
                    "vertex",
                    "left",
                )
                .select(
                    "vertex",
                    F.coalesce("k2", "core").alias("core"),
                )
                .localCheckpoint(eager=True)
            )
        return labels
