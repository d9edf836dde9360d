"""Entry point 2 — topic-style graph queries over a built graph
(SURVEY.md §3.2).

Reference analog: ``python -m agatha.topic_query`` — parse query proto
(two terms) → open SQLite adjacency → lazy bidirectional Dijkstra →
collect sentences adjacent to path nodes → LDA topic model
(agatha/topic_query/__main__.py, path_util.py — per SURVEY.md §3.2).
The LDA stage is model inference and out of scope (SURVEY.md §2.12);
everything else maps to superstep frontier joins over the partitioned
adjacency:

    term pair → ids (dictionary lookup) → G9 Bellman-Ford distances
    → neighborhood semi-join (J4) → ranked neighbor report (O2)

Entry point 3 (hypothesis ranking) reduces to the same shape: gather
per-pair graph features (G3/G4/G5/G7 outputs) and rank (SURVEY.md §3.3)
— provided here as ``pair_features``.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from sparkgatha.graph.pagerank import pagerank
from sparkgatha.graph.paths import neighborhood, shortest_paths


@dataclass
class TopicQueryResult:
    term_a: str
    term_b: str
    distance: float | None          # None = unreachable
    path_neighborhood: DataFrame    # edges incident to near-path nodes
    ranked_terms: DataFrame         # neighborhood terms by proximity


def _term_id(nodes: DataFrame, term: str) -> int | None:
    """Dictionary lookup for a user-supplied raw term: typed graphs
    store terms as 't:<term>' (entity_types, the reference's prefixed
    multigraph keys), legacy graphs store them raw.  The typed spelling
    is checked FIRST and the raw spelling only as a fallback — a single
    isin over both would be ambiguous when a corpus token itself starts
    with 't:' (nodes 't:t:x' and 't:x' both match a query for 't:x',
    and limit(1) would pick one nondeterministically)."""
    from sparkgatha.entity_types import TERM_TYPE, typed_key

    for spelling in (typed_key(TERM_TYPE, term), term):
        row = nodes.filter(F.col("key") == spelling).select("id").limit(1).collect()
        if row:
            return int(row[0]["id"])
    return None


def topic_query(
    spark: SparkSession,
    nodes: DataFrame,
    edges: DataFrame,
    term_a: str,
    term_b: str,
    max_hops: int = 20,
    slack: float = 0.25,
    weight_mode: str = "inverse",
) -> TopicQueryResult:
    """Two-term proximity query: distance a→b plus the neighborhood of
    vertices lying near shortest paths (dist_a(v) + dist_b(v) <=
    d(a,b) * (1 + slack) — relative detour allowance).

    ``weight_mode='inverse'`` (default) maps co-occurrence counts to
    path costs 1/weight so strongly-connected pairs are CLOSE — the
    reference's topic queries likewise prefer strong connections
    (agatha/topic_query/path_util.py per SURVEY.md §3.2); 'raw' sums
    the stored weights as-is."""
    ia, ib = _term_id(nodes, term_a), _term_id(nodes, term_b)
    if ia is None or ib is None:
        raise KeyError(f"unknown term(s): {term_a if ia is None else term_b}")
    if weight_mode == "inverse":
        edges = edges.select(
            "src", "dst", (F.lit(1.0) / F.col("weight")).alias("weight")
        )

    da = shortest_paths(edges, ia, max_hops).withColumnRenamed("distance", "da")
    db = shortest_paths(edges, ib, max_hops).withColumnRenamed("distance", "db")
    both = da.join(db, "vertex")
    row = da.filter(F.col("vertex") == ib).collect()
    dist = float(row[0]["da"]) if row else None
    if dist is None:
        empty = spark.createDataFrame([], edges.schema)
        return TopicQueryResult(term_a, term_b, None, empty, nodes.limit(0))

    near = both.filter(F.col("da") + F.col("db") <= dist * (1.0 + slack)).select(
        "vertex", (F.col("da") + F.col("db")).alias("detour")
    )
    nbh = neighborhood(edges, near.select("vertex"))
    ranked = (
        near.join(nodes, near.vertex == nodes.id)
        .select("key", F.round("detour", 6).alias("detour"))
        .orderBy("detour", "key")
    )
    return TopicQueryResult(term_a, term_b, dist, nbh, ranked)


def topic_rank(
    spark: SparkSession,
    nodes: DataFrame,
    edges: DataFrame,
    terms: list[str],
    alpha: float = 0.85,
    max_iter: int = 50,
    top_k: int = 50,
) -> DataFrame:
    """Seed-personalized PageRank relevance around the query terms —
    the graph-native stand-in for the reference's LDA topic stage
    (agatha/topic_query runs LDA over path-adjacent sentences, SURVEY.md
    §3.2; model inference is out of scope §2.12, but "which terms
    characterize this query's neighborhood" is answerable in-graph):
    teleport mass concentrates on the seed terms, so the stationary
    distribution ranks the whole vocabulary by random-walk proximity to
    the query.  Returns (key, rank) top_k, seeds included."""
    ids = []
    for t in terms:
        i = _term_id(nodes, t)
        if i is None:
            raise KeyError(f"unknown term: {t}")
        ids.append(i)
    pers = spark.createDataFrame(
        [(i, 1.0) for i in ids], "vertex long, weight double"
    )
    res = pagerank(
        edges, alpha=alpha, tol=1e-10, max_iter=max_iter,
        personalization=pers,
    )
    return (
        res.ranks.join(nodes, res.ranks.vertex == nodes.id)
        .select("key", F.col("rank"))
        .orderBy(F.col("rank").desc(), "key")
        .limit(top_k)
    )


def pair_features(
    spark: SparkSession,
    nodes: DataFrame,
    edges: DataFrame,
    pairs: DataFrame,
    max_iter: int = 30,
) -> DataFrame:
    """Entry point 3 shape (SURVEY.md §3.3): per-(term_a, term_b) graph
    features for downstream ranking — degrees, PageRank, shared
    community, same component.  ``pairs(term_a string, term_b string)``.
    """
    from sparkgatha.graph.cc import connected_components
    from sparkgatha.graph.degrees import out_degrees
    from sparkgatha.graph.pagerank import pagerank

    ranks = pagerank(edges, tol=1e-8, max_iter=max_iter).ranks
    comps = connected_components(edges)
    degs = out_degrees(edges)

    from sparkgatha.entity_types import TERM_TYPE, node_kind, strip_kind

    feat = (
        nodes.join(ranks, nodes.id == ranks.vertex)
        .join(comps.withColumnRenamed("vertex", "v2"), F.col("id") == F.col("v2"))
        .join(degs.withColumnRenamed("vertex", "v3"), F.col("id") == F.col("v3"))
        # pairs carry RAW user TERMS: restrict to term-kind nodes FIRST
        # (legacy raw keys report the term kind too), THEN strip the
        # prefix so both graph generations join.  Stripping without the
        # kind filter would collapse 't:<x>' and 'v:<x>' onto one key
        # and fan the pairs join out with sim-node features.
        .filter(node_kind("key") == TERM_TYPE)
        .select(strip_kind("key").alias("key"), "rank", "component", "out_degree")
    )
    fa = feat.select(
        F.col("key").alias("term_a"),
        F.col("rank").alias("rank_a"),
        F.col("component").alias("comp_a"),
        F.col("out_degree").alias("degree_a"),
    )
    fb = feat.select(
        F.col("key").alias("term_b"),
        F.col("rank").alias("rank_b"),
        F.col("component").alias("comp_b"),
        F.col("out_degree").alias("degree_b"),
    )
    return (
        pairs.join(fa, "term_a")
        .join(fb, "term_b")
        .select(
            "term_a",
            "term_b",
            F.round("rank_a", 8).alias("rank_a"),
            F.round("rank_b", 8).alias("rank_b"),
            "degree_a",
            "degree_b",
            (F.col("comp_a") == F.col("comp_b")).alias("same_component"),
            F.round(
                F.col("rank_a") * F.col("rank_b"), 12
            ).alias("rank_product"),
        )
    )
