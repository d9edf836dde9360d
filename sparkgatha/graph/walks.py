"""Deterministic random-walk corpus generation (SURVEY.md §2.11 G18).

DeepWalk/node2vec-style training corpora are walk sequences over the
co-occurrence graph — the standard input for skip-gram graph-embedding
training (Perozzi et al., "DeepWalk", KDD 2014).  A 100 TB pipeline
needs the walks REPRODUCIBLE across engines, retries, and
partitionings, so instead of per-task RNG state the next hop is a pure
hash rule over the SORTED neighbor list:

    step t of walk w at vertex v moves to
        nbrs(v)[ md5int(w || ':' || t || ':' || seed)  mod  deg(v) ]

where ``nbrs(v)`` is v's lexicographically sorted distinct neighbor
array and ``md5int`` is the first 15 hex chars of md5 as a (positive)
integer — the same engine-independent md5→int convention the node
dictionary uses.  Every hash input is row-local, so the choice is
deterministic regardless of task placement or retry, uniform over
distinct neighbors, and expressible in ANSI SQL (``list_sort`` + list
indexing), so the full walk corpus is DuckDB-oracle checkable round for
round.

Physical shape per step (the 100 TB story): one keyed join of the
O(#walks) frontier against the ADJACENCY-LIST table (one row per
vertex, the A4 CSR shape) + an O(1) array index — no per-neighbor row
expansion, so a hub vertex costs the same as a leaf (the naive
neighbor-explode form is O(deg) rows per walk per step: one walk
landing on a 10^6-degree hub multiplies the join output a million
times; the indexed pick makes it exactly one row).  The adjacency-list
table is hash(src)-partitioned, sorted, and persisted ONCE, so each
step re-shuffles only the frontier.  Walks at a sink vertex end early,
exactly like the SQL unroll's inner join semantics.

``max_neighbors`` caps the stored neighbor array (keeps the
lexicographically smallest) — the hub guard for graphs where a single
vertex's neighbor list would not fit an aggregation buffer at 10^12
edges; deterministic, and mirrored in SQL by slicing the sorted list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from sparkgatha.util import md5_long as _md5int, no_aqe


def random_walks(
    edges: DataFrame,
    length: int,
    walks_per_vertex: int = 1,
    seed: int = 0,
    max_neighbors: int | None = None,
) -> DataFrame:
    """(walk_id string, step int, vertex) — ``walks_per_vertex``
    hash-deterministic walks of up to ``length`` hops from every vertex
    that has out-edges.

    ``walk_id`` is ``<start>#<i>`` for i in [0, walks_per_vertex); step
    0 is the start vertex itself.  A walk reaching a sink emits no
    further rows (its sequence just ends short, as a corpus consumer
    expects).  Pass the symmetrized edge set for undirected semantics.
    """
    if length < 1:
        raise ValueError(f"length must be >= 1, got {length}")
    if walks_per_vertex < 1:
        raise ValueError(
            f"walks_per_vertex must be >= 1, got {walks_per_vertex}"
        )
    if max_neighbors is not None and max_neighbors < 1:
        raise ValueError(f"max_neighbors must be >= 1, got {max_neighbors}")
    spark = edges.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    with no_aqe(spark):
        nbrs = F.sort_array(F.collect_set("dst"))
        if max_neighbors is not None:
            nbrs = F.slice(nbrs, 1, max_neighbors)
        # one row per vertex (A4 CSR shape), stationary hash(src) layout
        adj = (
            edges.select("src", "dst")
            .filter(F.col("src") != F.col("dst"))
            .groupBy("src")
            .agg(nbrs.alias("nbrs"))
            .withColumn("deg", F.size("nbrs"))
            .repartition(n_part, "src")
            .sortWithinPartitions("src")
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        try:
            starts = adj.select(F.col("src").alias("v"))
            replicas = spark.range(walks_per_vertex).select(
                F.col("id").cast("int").alias("i")
            )
            frontier = (
                starts.crossJoin(F.broadcast(replicas))
                .select(
                    F.concat_ws(
                        "#", F.col("v").cast("string"), F.col("i").cast("string")
                    ).alias("walk_id"),
                    F.col("v").alias("cur"),
                )
                .localCheckpoint(eager=True)
            )
            out = frontier.select(
                "walk_id", F.lit(0).alias("step"), F.col("cur").alias("vertex")
            )
            for t in range(1, length + 1):
                hop = _md5int(
                    F.concat_ws(":", F.col("walk_id"), F.lit(str(t)), F.lit(str(seed)))
                )
                idx = (F.pmod(hop, F.col("deg")) + 1).cast("int")
                frontier = (
                    frontier.join(adj, frontier.cur == adj.src)
                    .select(
                        "walk_id",
                        F.element_at("nbrs", idx).alias("cur"),
                    )
                    .localCheckpoint(eager=True)
                )
                out = out.unionByName(
                    frontier.select(
                        "walk_id",
                        F.lit(t).alias("step"),
                        F.col("cur").alias("vertex"),
                    )
                )
        finally:
            # every frontier snapshot is eagerly checkpointed, so the
            # returned plan never references the cached adjacency again
            adj.unpersist()
        return out
