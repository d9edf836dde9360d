"""G5 — connected components via small-star/large-star (SURVEY.md §2.11 G5).

Algorithm: Kiveris, Lattanzi, Mirrokni, Rastogi, Vassilvitskii,
"Connected Components in MapReduce and Beyond", SoCC 2014 — named
explicitly by the north rule (BASELINE.json).  Exact-match bar: the
final label of every vertex is the minimum vertex id of its component.

Each round is two DataFrame supersteps over the current parent-edge set:

  large-star: for every vertex u (neighbors from *both* orientations),
      m = min(N(u) ∪ {u}); re-link every strictly-larger neighbor to m.
  small-star: with neighbors v ≤ u only, m = min(N≤(u) ∪ {u});
      link u and all those neighbors to m.

Both are groupBy(min) + join re-link — algebraic, map-side combinable,
and convergence (edge set fixpoint) is detected with an order-insensitive
xxhash64/bit_xor fingerprint, one scalar action per round.  Lineage is
truncated per round via localCheckpoint (SURVEY.md §4.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from sparkgatha.util import no_aqe


def _canonical(edges: DataFrame) -> DataFrame:
    """Undirected edge set as (u > v) canonical pairs, self-loops dropped."""
    return (
        edges.select(
            F.greatest("src", "dst").alias("u"), F.least("src", "dst").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(e: DataFrame) -> DataFrame:
    """Connect all strictly-larger neighbors of u to min(N(u) ∪ {u})."""
    nbrs = e.select(F.col("u").alias("a"), F.col("v").alias("b")).unionByName(
        e.select(F.col("v").alias("a"), F.col("u").alias("b"))
    )
    m = nbrs.groupBy("a").agg(F.min("b").alias("mb")).select(
        "a", F.least("mb", F.col("a")).alias("m")
    )
    return (
        nbrs.join(m, "a")
        .filter(F.col("b") > F.col("a"))
        .select(F.col("b").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """With neighbors v ≤ u (canonical orientation is exactly that),
    link u and each such neighbor to the minimum."""
    m = e.groupBy("u").agg(F.min("v").alias("m"))
    relink_nbrs = (
        e.join(m, "u")
        .filter(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    relink_self = m.select(F.col("u"), F.col("m").alias("v"))
    return (
        relink_nbrs.unionByName(relink_self)
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _fingerprint(e: DataFrame):
    row = (
        e.select(
            F.xxhash64(F.concat_ws(":", F.col("u"), F.col("v"))).alias("h")
        )
        .agg(F.expr("bit_xor(h)").alias("x"), F.count("*").alias("n"))
        .collect()[0]
    )
    return (row["x"], row["n"])


def connected_components(
    edges: DataFrame, max_iter: int = 50
) -> DataFrame:
    """(vertex long, component long) — component = min vertex id, exact.

    Isolated vertices never appear in an edge table; callers with a
    separate vertex set should left-join and coalesce(component, vertex).
    """
    with no_aqe(edges.sparkSession):
        vertices = (
            edges.select(F.col("src").alias("vertex"))
            .unionByName(edges.select(F.col("dst").alias("vertex")))
            .distinct()
            .localCheckpoint(eager=True)
        )
        e = _canonical(edges).localCheckpoint(eager=True)
        prev_fp = _fingerprint(e)
        for _ in range(max_iter):
            e = _small_star(_large_star(e)).localCheckpoint(eager=False)
            fp = _fingerprint(e)
            if fp == prev_fp:
                break
            prev_fp = fp
    # fixpoint: e is a star forest (u → component min)
    labels = e.select(F.col("u").alias("vertex"), F.col("v").alias("component"))
    return (
        vertices.join(labels, "vertex", "left")
        .select(
            "vertex", F.coalesce("component", "vertex").alias("component")
        )
    )
