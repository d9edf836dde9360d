"""G9 — weighted shortest paths as Bellman-Ford-style frontier supersteps
(SURVEY.md §2.11 G9).

Reference analog: AGATHA's topic query runs a lazy bidirectional Dijkstra
over the SQLite adjacency store, paging neighbor lists on demand
(agatha/topic_query/path_util.py, agatha/util/sqlite3_lookup.py — per
SURVEY.md §3.2).  The distributed replacement relaxes the whole frontier
each superstep: dist ⋈ edges → min-agg → join-compare, until no distance
improves.  The LDA topic stage is out of scope (SURVEY.md §2.12);
neighborhood collection around the path is a semi-join (J4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from sparkgatha.util import no_aqe

#: frontier rows below which the relax join broadcasts the frontier
#: (above it the join falls back to shuffle against the fixed layout)
BROADCAST_FRONTIER_MAX = 5_000_000


def shortest_paths(
    edges: DataFrame,
    source: int,
    max_iter: int = 50,
    num_partitions: int = 32,
) -> DataFrame:
    """Single-source weighted distances (vertex long, distance double)
    over directed ``edges(src, dst, weight)``; unreachable vertices are
    absent.  Non-negative weights assumed (as in the reference's use).

    Physical discipline (G11): edges are hash(src)-partitioned and
    persisted ONCE; each superstep broadcasts the (small) frontier into
    the relax join so the stationary edge layout never re-shuffles, and
    the improved-vertex count rides the same action that materializes
    the lazily checkpointed next state — one Spark job per superstep.
    """
    spark = edges.sparkSession
    dist = spark.createDataFrame(
        [(source, 0.0)], "vertex long, distance double"
    ).localCheckpoint(eager=True)
    frontier = dist
    frontier_rows = 1
    with no_aqe(spark):
        layout = (
            edges.select("src", "dst", "weight")
            .repartition(num_partitions, "src")
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        layout.count()  # materialize the one-time layout
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
                    (F.col("distance") + F.col("weight")).alias("distance"),
                )
                .groupBy("vertex")
                .agg(F.min("distance").alias("distance"))
            )
            merged = (
                dist.alias("d")
                .join(cand.alias("c"), "vertex", "full_outer")
                .select(
                    "vertex",
                    F.least(
                        F.coalesce(F.col("d.distance"), F.lit(float("inf"))),
                        F.coalesce(F.col("c.distance"), F.lit(float("inf"))),
                    ).alias("distance"),
                    (
                        F.coalesce(F.col("c.distance"), F.lit(float("inf")))
                        < F.coalesce(F.col("d.distance"), F.lit(float("inf")))
                    ).alias("_improved"),
                )
                .localCheckpoint(eager=False)
            )
            frontier_rows = merged.filter(F.col("_improved")).count()
            dist = merged.select("vertex", "distance")
            if frontier_rows == 0:
                break
            frontier = merged.filter(F.col("_improved")).select(
                "vertex", "distance"
            )
        layout.unpersist()
    return dist


def pair_distance(
    edges: DataFrame, a: int, b: int, max_iter: int = 50
) -> float | None:
    """Topic-query shape: distance between two terms (SURVEY.md §3.2)."""
    d = shortest_paths(edges, a, max_iter).filter(F.col("vertex") == b).collect()
    return float(d[0]["distance"]) if d else None


def neighborhood(edges: DataFrame, vertices: DataFrame) -> DataFrame:
    """J4 semi-join: edges incident to a vertex set (the reference's
    'collect sentences adjacent to path nodes' step)."""
    vs = vertices.select(F.col("vertex"))
    return edges.join(
        vs, edges.src == vs.vertex, "left_semi"
    ).unionByName(
        edges.join(vs.alias("v2"), edges.dst == F.col("v2.vertex"), "left_semi")
    ).distinct()
