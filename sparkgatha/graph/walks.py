"""Deterministic random-walk corpus generation (SURVEY.md §2.11 G18).

DeepWalk/node2vec-style training corpora are walk sequences over the
co-occurrence graph — the standard input for skip-gram graph-embedding
training (Perozzi et al., "DeepWalk", KDD 2014).  A 100 TB pipeline
needs the walks REPRODUCIBLE across engines, retries, and partitionings,
so instead of per-task RNG state the next-hop choice is a pure hash
rule:

    step t of walk w at vertex v moves to
        argmin_{n ∈ N(v)}  md5(w || ':' || t || ':' || seed || ':' || n)

Every input that feeds the hash is row-local, so the choice is
deterministic regardless of task placement or retry — the same property
the engine's hash-sampling operator (q_sample_hash) and the reference's
hashed node ids rely on — and the argmin is expressible in ANSI SQL
(``arg_min``/``min_by``), so the full walk corpus is DuckDB-oracle
checkable round for round.  The hash includes the neighbor id, so
scores are distinct within a step and the argmin is unique (no
tie-break rule needed).

Physical shape per step (the 100 TB story): one keyed join of the
O(#walks) frontier against the adjacency + one partial-aggregable
``min_by`` groupBy — the PageRank superstep shape.  The adjacency is
laid out ONCE via the G11 stationary partitioning (hash(src) + persist,
graph/partitioning.py), so each step's sort-merge join re-shuffles only
the small frontier side — the edge table never crosses the wire after
its initial layout Exchange.  Walks at a sink vertex (no out-neighbors)
end early, exactly like the SQL unroll's inner join semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from sparkgatha.graph.partitioning import layout_edges
from sparkgatha.util import no_aqe


def _hop_score(walk_id, step: int, seed: int, dst):
    return F.md5(
        F.concat_ws(
            ":",
            walk_id.cast("string"),
            F.lit(str(step)),
            F.lit(str(seed)),
            dst.cast("string"),
        )
    )


def random_walks(
    edges: DataFrame,
    length: int,
    walks_per_vertex: int = 1,
    seed: int = 0,
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
    spark = edges.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    with no_aqe(spark):
        adj = layout_edges(
            edges.select("src", "dst")
            .filter(F.col("src") != F.col("dst"))
            .distinct(),
            num_partitions=n_part,
            key="src",
        )
        try:
            starts = adj.select(F.col("src").alias("v")).distinct()
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
                frontier = (
                    frontier.join(adj, frontier.cur == adj.src)
                    .groupBy("walk_id")
                    .agg(
                        F.min_by(
                            "dst",
                            _hop_score(F.col("walk_id"), t, seed, F.col("dst")),
                        ).alias("cur")
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
