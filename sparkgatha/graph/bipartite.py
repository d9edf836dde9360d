"""G36 — bipartite 2-coloring and odd-cycle detection.

A graph is bipartite iff it has no odd cycle; the constructive check
colors every vertex with the PARITY of its min-hop distance from its
component's root (the component's minimum vertex id — the same
canonical root G5 elects), then looks for an edge joining two
same-colored vertices.  Zero conflict edges ⟺ bipartite, and the
coloring is then the unique 2-partition (up to flip) with the root on
side 0.  The reference family: a term/entity co-occurrence pipeline
meets genuinely bipartite layers (doc–term, part–supplier) where the
two-sided structure is an invariant worth asserting, and the conflict
edges are exactly the witnesses that break it.

Physical discipline: one G5 run elects roots (under G5's OWN iteration
bound — star contraction converges in O(log V) rounds — while
``max_iter`` bounds only the BFS, whose round count is the diameter);
one multi-source BFS
(every root seeds distance 0 — roots are unique per component, so the
frontiers never interfere) over the stationary hash(src)-partitioned
edge layout, frontier broadcast per superstep (paths.shortest_paths'
shape, generalized to a seed FRAME); conflicts are a single self-join
of the edge list against the color table.  Supersteps = graph
diameter; state is O(V); nothing driver-side but the per-round
improved count.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from sparkgatha.graph.canon import canonical_undirected
from sparkgatha.graph.cc import connected_components
from sparkgatha.graph.paths import min_dist_from_seeds


@dataclass
class BipartiteResult:
    #: (vertex, component, dist, color) — color = dist % 2, root side 0
    colors: DataFrame
    #: (u, v) canonical edges joining two same-colored vertices; empty
    #: iff the graph is bipartite (each is a witness edge on an odd
    #: cycle through its component's root)
    conflicts: DataFrame


def bipartite_color(
    edges: DataFrame,
    max_iter: int = 50,
    num_partitions: int = 32,
) -> BipartiteResult:
    """2-color ``edges`` (read undirected, self-loops dropped by the
    canonicalization; a self-loop is an odd cycle the caller should
    screen separately if it must count).  Raises if the BFS has not
    drained within ``max_iter`` supersteps — a silent truncation would
    mislabel the unreached tail."""
    if max_iter < 1:
        raise ValueError(f"max_iter must be >= 1, got {max_iter}")
    e = canonical_undirected(edges).localCheckpoint(eager=True)
    # root election uses G5's own bound: star contraction converges in
    # O(log V) rounds, so the default (50) dominates any real graph;
    # forwarding the BFS's diameter-scaled max_iter here would let a
    # small value silently truncate the component labels instead of
    # tripping the BFS rail below
    comp = connected_components(
        e.select(F.col("u").alias("src"), F.col("v").alias("dst"))
    ).localCheckpoint(eager=True)
    roots = comp.filter(F.col("vertex") == F.col("component")).select(
        "vertex", F.lit(0.0).alias("distance")
    )
    sym = e.select(
        F.col("u").alias("src"), F.col("v").alias("dst"),
        F.lit(1.0).alias("weight"),
    ).unionByName(
        e.select(
            F.col("v").alias("src"), F.col("u").alias("dst"),
            F.lit(1.0).alias("weight"),
        )
    )
    # the shared G9 relaxation loop (paths.min_dist_from_seeds), seeded
    # with every root at distance 0 — unit weights make it plain BFS
    dist, drained = min_dist_from_seeds(
        sym, roots, max_iter=max_iter, num_partitions=num_partitions
    )
    if not drained:
        raise RuntimeError(
            f"bipartite_color: BFS still active after max_iter={max_iter} "
            "supersteps; raise max_iter (diameter exceeds it)"
        )
    colors = (
        comp.join(dist, "vertex")
        .select(
            "vertex",
            "component",
            F.col("distance").cast("long").alias("dist"),
            (F.col("distance").cast("long") % 2).alias("color"),
        )
        .localCheckpoint(eager=True)
    )
    cu = colors.select(F.col("vertex").alias("u"), F.col("color").alias("cu"))
    cv = colors.select(F.col("vertex").alias("v"), F.col("color").alias("cv"))
    conflicts = (
        e.join(cu, "u").join(cv, "v")
        .filter(F.col("cu") == F.col("cv"))
        .select("u", "v")
    )
    return BipartiteResult(colors=colors, conflicts=conflicts)
