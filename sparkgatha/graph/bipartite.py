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

Physical discipline: one G5 run elects roots; one multi-source BFS
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
from pyspark.storagelevel import StorageLevel

from sparkgatha.graph.canon import canonical_undirected
from sparkgatha.graph.cc import connected_components
from sparkgatha.graph.paths import BROADCAST_FRONTIER_MAX
from sparkgatha.util import no_aqe


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
    spark = edges.sparkSession
    e = canonical_undirected(edges).localCheckpoint(eager=True)
    comp = connected_components(
        e.select(F.col("u").alias("src"), F.col("v").alias("dst")),
        max_iter=max_iter,
    ).localCheckpoint(eager=True)
    dist = (
        comp.filter(F.col("vertex") == F.col("component"))
        .select("vertex", F.lit(0).alias("dist"))
        .localCheckpoint(eager=True)
    )
    frontier = dist
    frontier_rows = dist.count()
    with no_aqe(spark):
        layout = (
            e.select(F.col("u").alias("src"), F.col("v").alias("dst"))
            .unionByName(
                e.select(F.col("v").alias("src"), F.col("u").alias("dst"))
            )
            .repartition(num_partitions, "src")
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        layout.count()
        drained = False
        for _ in range(max_iter):
            probe = (
                F.broadcast(frontier)
                if frontier_rows <= BROADCAST_FRONTIER_MAX
                else frontier
            )
            cand = (
                layout.join(probe, layout.src == probe.vertex)
                .select(
                    F.col("dst").alias("vertex"),
                    (F.col("dist") + F.lit(1)).alias("dist"),
                )
                .groupBy("vertex")
                .agg(F.min("dist").alias("dist"))
            )
            merged = (
                dist.alias("d")
                .join(cand.alias("c"), "vertex", "full_outer")
                .select(
                    "vertex",
                    F.least(
                        F.coalesce(F.col("d.dist"), F.lit(2**31)),
                        F.coalesce(F.col("c.dist"), F.lit(2**31)),
                    ).alias("dist"),
                    (
                        F.coalesce(F.col("c.dist"), F.lit(2**31))
                        < F.coalesce(F.col("d.dist"), F.lit(2**31))
                    ).alias("_improved"),
                )
                .localCheckpoint(eager=False)
            )
            frontier_rows = merged.filter(F.col("_improved")).count()
            dist = merged.select("vertex", "dist")
            if frontier_rows == 0:
                drained = True
                break
            frontier = merged.filter(F.col("_improved")).select(
                "vertex", "dist"
            )
        layout.unpersist()
    if not drained:
        raise RuntimeError(
            f"bipartite_color: BFS still active after max_iter={max_iter} "
            "supersteps; raise max_iter (diameter exceeds it)"
        )
    colors = (
        comp.join(dist, "vertex")
        .select(
            "vertex", "component", "dist", (F.col("dist") % 2).alias("color")
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
