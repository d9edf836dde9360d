"""Link-prediction features over the co-occurrence graph — the engine's
hypothesis-ranking primitive (SURVEY.md §2.11).

The reference system's entire purpose is ranking UNSEEN term pairs by
how likely the literature graph is to connect them next ([P1] — AGATHA
ranks hypothesis pairs; its classical baselines in the comparison table
are exactly these topological scores).  This module computes the four
classical link-prediction scores for every non-adjacent candidate pair
that shares at least one neighbor (the standard 2-hop candidate set):

  * ``common_neighbors``  |N(a) ∩ N(b)|
  * ``jaccard``           |N(a) ∩ N(b)| / |N(a) ∪ N(b)|
  * ``adamic_adar``       Σ_{z ∈ N(a) ∩ N(b)} 1 / ln(deg z)
  * ``pref_attachment``   deg(a) · deg(b)

Physical shape (the 100 TB story):

  * candidates come from the wedge self-join through the shared
    neighbor z — the same O(deg²) pivot the triangle counter has, so
    the same hub discipline applies: ``hub_degree_cap`` excludes
    pivots above the cap from generating wedges (a hub shared by two
    terms is also the LEAST informative witness: 1/ln(deg) → 0, so the
    approximation drops the lowest-signal work first, exactly like the
    reference's degree-capped neighborhood sampling);
  * the non-adjacency check is a broadcast-free sort-merge LEFT ANTI
    join against the canonical edge set — no NOT-EXISTS subquery
    re-scan;
  * per-pair aggregation is a partial-aggregable groupBy (map-side
    combine collapses each partition's wedge list before the
    exchange);
  * degrees join back as two tiny (|V|-row) partial-agg tables.

No Cartesian anywhere; every join is keyed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _neighbor_pairs(edges: DataFrame) -> DataFrame:
    """Distinct directed neighbor pairs (both orientations), self-loops
    dropped — the symmetric neighbor relation N."""
    fwd = edges.select(F.col("src").alias("v"), F.col("dst").alias("n"))
    rev = edges.select(F.col("dst").alias("v"), F.col("src").alias("n"))
    return fwd.unionByName(rev).filter(F.col("v") != F.col("n")).distinct()


def _wedge_base(edges: DataFrame, hub_degree_cap: int | None):
    """Shared wedge machinery for both pair-scoring ops: (deg, wedges,
    canon) where deg = (v, d), wedges = (z, a, b, dz) with a < b, and
    canon = the canonical a<b adjacent pair set."""
    nbrs = _neighbor_pairs(edges)
    deg = nbrs.groupBy("v").agg(F.count("*").alias("d"))

    pivots = nbrs.join(deg, "v")
    if hub_degree_cap is not None:
        pivots = pivots.filter(F.col("d") <= hub_degree_cap)

    # wedges through pivot z: (z, a), (z, b) with a < b; carry deg(z)
    left = pivots.select(
        F.col("v").alias("z"), F.col("n").alias("a"), F.col("d").alias("dz")
    )
    right = nbrs.select(F.col("v").alias("z"), F.col("n").alias("b"))
    wedges = left.join(right, "z").filter(F.col("a") < F.col("b"))

    canon = nbrs.filter(F.col("v") < F.col("n")).select(
        F.col("v").alias("a"), F.col("n").alias("b")
    )
    return deg, wedges, canon


def _score_pairs(pairs: DataFrame, deg: DataFrame) -> DataFrame:
    """Attach the degree-derived scores to (a, b, common_neighbors,
    adamic_adar) rows and project the public column set."""
    da = deg.select(F.col("v").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("v").alias("b"), F.col("d").alias("db"))
    return (
        pairs.join(da, "a")
        .join(db, "b")
        .select(
            F.col("a").alias("src"),
            F.col("b").alias("dst"),
            "common_neighbors",
            (
                F.col("common_neighbors")
                / (F.col("da") + F.col("db") - F.col("common_neighbors"))
            ).alias("jaccard"),
            "adamic_adar",
            (F.col("da") * F.col("db")).alias("pref_attachment"),
        )
    )


def link_prediction_features(
    edges: DataFrame,
    hub_degree_cap: int | None = None,
) -> DataFrame:
    """Classical link-prediction scores for non-adjacent 2-hop pairs.

    Input: an edge table (src, dst, ...) read as an UNDIRECTED graph
    (both orientations are folded into one neighbor relation, so the
    caller may pass either a symmetrized or a canonical a<b edge set).

    Output: (src, dst, common_neighbors, jaccard, adamic_adar,
    pref_attachment) with src < dst — one row per candidate pair.

    ``hub_degree_cap``: drop wedge pivots with degree > cap.  Exact
    when None (the oracle-scale default); at web scale a hub pivot
    contributes O(deg²) wedges worth ~1/ln(deg) ≈ 0 signal each, so
    capping removes the quadratic term while perturbing scores least.
    Pairs whose ONLY witnesses are capped hubs disappear from the
    candidate set — the same contract as the reference's sampled
    neighborhoods.
    """
    deg, wedges, canon = _wedge_base(edges, hub_degree_cap)

    # keep only NON-adjacent pairs: anti-join on the canonical edge set
    cand = wedges.join(canon, ["a", "b"], "left_anti")
    scored = cand.groupBy("a", "b").agg(
        F.count("*").alias("common_neighbors"),
        F.sum(1.0 / F.log("dz")).alias("adamic_adar"),
    )
    return _score_pairs(scored, deg)


def edge_similarity(
    edges: DataFrame,
    hub_degree_cap: int | None = None,
) -> DataFrame:
    """The same four topological scores for every ADJACENT pair — the
    shared-nearest-neighbor (SNN) edge-strength profile: an edge whose
    endpoints share many neighbors is intra-community glue, one whose
    endpoints share none is a bridge.  The standard relevance filter
    before community analysis and the dual of
    ``link_prediction_features`` (which scores the non-adjacent pairs).

    Output: (src, dst, common_neighbors, jaccard, adamic_adar,
    pref_attachment) with src < dst — EXACTLY one row per undirected
    edge, including support-0 bridges (zero-filled, which the wedge
    join alone would miss).

    Physical shape: identical to the link-prediction pass — the wedge
    join is filtered DOWN by a semi-join on the edge set before the
    per-pair aggregation (the 100 TB discipline: candidate rows never
    exceed triangle-corner volume), then the canonical edge set
    left-joins the support table to resurrect support-0 edges.
    ``common_neighbors`` here is exactly the k-truss edge support
    (graph/truss.py) — same quantity, unpeeled.
    """
    deg, wedges, canon = _wedge_base(edges, hub_degree_cap)

    # keep only ADJACENT pairs: semi-join BEFORE the agg shrinks the
    # exchange to triangle-corner volume
    sup = (
        wedges.join(canon, ["a", "b"], "left_semi")
        .groupBy("a", "b")
        .agg(
            F.count("*").alias("common_neighbors"),
            F.sum(1.0 / F.log("dz")).alias("adamic_adar"),
        )
    )
    # every edge gets a row — support-0 bridges zero-filled
    filled = canon.join(sup, ["a", "b"], "left").select(
        "a",
        "b",
        F.coalesce("common_neighbors", F.lit(0)).alias("common_neighbors"),
        F.coalesce("adamic_adar", F.lit(0.0)).alias("adamic_adar"),
    )
    return _score_pairs(filled, deg)
