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
so at web scale every subsequent round scans a shrinking table; the
survivor set is O(|V|) and localCheckpointed per round to truncate
lineage.  Convergence = survivor count unchanged (peeling is monotone
non-increasing, so an equal count IS the fixpoint — no fingerprint
needed).

``core_numbers`` runs the peel for k = 1, 2, ... on the previous
core's residual graph (the (k+1)-core is a subgraph of the k-core, so
each pass starts from the already-peeled edge set — total work is the
telescoping sum, not k × full-graph).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from sparkgatha.util import no_aqe


def _undirected(edges: DataFrame) -> DataFrame:
    """Canonical u < v distinct undirected edges, self-loops dropped."""
    return (
        edges.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _peel(e: DataFrame, k: int, max_iter: int) -> DataFrame:
    """Iterate the degree-≥-k filter over a canonical edge set until
    fixpoint (or ``max_iter`` synchronous rounds — callers comparing
    against a fixed-round unrolled oracle rely on the round count being
    exactly the oracle's when convergence is not reached earlier).
    Returns the surviving edge set."""
    e = e.localCheckpoint(eager=True)
    n_prev = (
        e.select(F.col("u").alias("x"))
        .unionByName(e.select(F.col("v").alias("x")))
        .distinct()
        .count()
    )
    for _ in range(max_iter):
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
        n = (
            e.select(F.col("u").alias("x"))
            .unionByName(e.select(F.col("v").alias("x")))
            .distinct()
            .count()
        )
        if n == n_prev:
            break
        n_prev = n
    return e


def k_core(edges: DataFrame, k: int, max_iter: int = 50) -> DataFrame:
    """(vertex, core_degree): vertices of the k-core with their degree
    inside the core.  Empty result when the k-core is empty."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    spark = edges.sparkSession
    with no_aqe(spark):
        e = _peel(_undirected(edges), k, max_iter)
        return (
            e.select(F.col("u").alias("vertex"))
            .unionByName(e.select(F.col("v").alias("vertex")))
            .groupBy("vertex")
            .agg(F.count("*").alias("core_degree"))
        )


def core_numbers(edges: DataFrame, max_k: int = 1000, max_iter: int = 50) -> DataFrame:
    """(vertex, core): the largest k for which the vertex survives the
    k-core peel — exact (``networkx.core_number`` semantics).  Peels
    k = 1, 2, ... over the telescoping residual graph until it empties
    (or ``max_k``, a runaway bound for degenerate inputs)."""
    spark = edges.sparkSession
    with no_aqe(spark):
        e = _undirected(edges).localCheckpoint(eager=True)
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
