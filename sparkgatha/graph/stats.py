"""G20/G21/G31/G32 — whole-graph topology statistics: degree
assortativity, community modularity, global transitivity, and directed
reciprocity.

Both are single-pass DataFrame aggregations over the edge table — no
iteration, no driver loop — and both reduce to ONE output row, so their
cost at 10^12 edges is exactly one degree shuffle plus one edge-wide
join against a |V|-row (broadcast-able after aggregation) side:

  * assortativity: Pearson correlation of the endpoint degrees across
    the directed (symmetrized) edge list — ``F.corr`` is a partial-
    aggregable JVM aggregate, so the edge scan never re-shuffles;
  * modularity: Q = Σ_c [ L_c/m − (D_c/(2m))² ] needs only per-label
    degree sums and the intra-community edge count — two groupBys over
    |V|- and |E|-sized inputs with map-side partial aggregation.

Semantics pinned to the public definitions (Newman 2002 assortativity;
Newman–Girvan 2004 modularity), validated against
``networkx.degree_assortativity_coefficient`` and
``networkx.algorithms.community.modularity`` in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from sparkgatha.graph.canon import canonical_undirected


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """One row (assortativity double): Pearson degree correlation over
    the DISTINCT symmetrized edge list read as an undirected graph.

    ``edges(src, dst, *)`` must carry both orientations of every
    undirected edge (extract.symmetrize); each undirected edge then
    contributes both (deg u, deg v) and (deg v, deg u) — exactly the
    double-counted sum networkx.degree_assortativity_coefficient uses,
    so the coefficient matches it to fp precision.  Degree = distinct-
    neighbor count.
    """
    e = edges.select("src", "dst").distinct()
    deg = e.groupBy("src").agg(F.count("*").alias("d"))
    du = deg.select(F.col("src").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("src").alias("v"), F.col("d").alias("dv"))
    x = F.col("du").cast("double")
    y = F.col("dv").cast("double")
    # explicit Pearson with try_divide: a regular graph (zero degree
    # variance — e.g. a complete fixture graph) yields NULL, matching
    # DuckDB's corr() instead of tripping the ANSI divide-by-zero rail
    return (
        e.join(du, e.src == du.u)
        .join(dv, e.dst == dv.v)
        .agg(
            F.try_divide(
                F.covar_samp(x, y), F.stddev_samp(x) * F.stddev_samp(y)
            ).alias("assortativity")
        )
    )


def modularity(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """One row (modularity double): Newman–Girvan modularity of the
    ``labels(vertex, label)`` partition over the DISTINCT symmetrized
    ``edges`` read as an unweighted undirected graph (self-loops are
    ignored).

        Q = Σ_c [ L_c / m  −  (D_c / 2m)² ]

    with m undirected edges, L_c intra-community undirected edges and
    D_c the summed degree of community c.  Computed from the directed
    (both-orientations) list: 2m = |e|, intra directed edges = 2·L_c.
    """
    e = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    lu = labels.select(F.col("vertex").alias("src"), F.col("label").alias("cu"))
    lv = labels.select(F.col("vertex").alias("dst"), F.col("label").alias("cv"))
    both = e.join(lu, "src", "left").join(lv, "dst", "left")
    # raise-don't-truncate: an endpoint missing from ``labels`` would
    # silently shrink m and the degree masses — Q for a different graph
    # (networkx raises NotAPartition for the same input)
    n_unlabeled = (
        both.filter(F.col("cu").isNull() | F.col("cv").isNull())
        .limit(1)
        .count()
    )
    if n_unlabeled:
        raise ValueError(
            "modularity: labels do not cover every edge endpoint — not a "
            "partition of the graph's vertex set"
        )
    # per-community directed-degree sums and intra-community directed counts
    per_c = both.groupBy("cu").agg(
        F.count("*").alias("d_c"),  # Σ deg over community cu
        F.sum((F.col("cu") == F.col("cv")).cast("long")).alias("intra2"),
    )
    # Q = Σ intra2 / 2m − Σ d_c² / (2m)², all plain aggregates over the
    # per-community table (no window, no second pass over the edges)
    two_m = F.sum("d_c").cast("double")
    return per_c.agg(
        (
            F.sum("intra2").cast("double") / two_m
            - F.sum(F.col("d_c").cast("double") * F.col("d_c")) / (two_m * two_m)
        ).alias("modularity")
    )


def transitivity(edges: DataFrame) -> DataFrame:
    """One row (transitivity double): the GLOBAL clustering coefficient
    3·triangles / triads = 6·T / Σ_v d(v)·(d(v)−1) over the DISTINCT
    symmetrized edge list read as an undirected simple graph (self-loops
    dropped by canonicalization) — ``networkx.transitivity`` semantics,
    including its triangle-free convention (0.0, even on a wedge-free
    graph, rather than 0/0).

    Cost shape at 10^12 edges: the same degree-oriented wedge join the
    triangle counter runs (hub-safe — a hub's oriented out-degree is
    tiny) feeding two single-row aggregates; no per-vertex output is
    materialized.
    """
    from sparkgatha.graph.triangles import _degrees, _orient, _triangles

    und = canonical_undirected(edges).localCheckpoint(eager=True)
    deg = _degrees(und).localCheckpoint(eager=True)
    o = _orient(und, deg)
    t = _triangles(o).agg(F.count("*").alias("t"))  # one row per triangle
    d = F.col("deg").cast("double")
    triads2 = deg.agg(F.sum(d * (d - F.lit(1.0))).alias("w2"))  # Σ d(d−1)
    return t.crossJoin(triads2).select(
        F.coalesce(
            F.try_divide(F.lit(6.0) * F.col("t"), F.col("w2")), F.lit(0.0)
        ).alias("transitivity")
    )


def reciprocity(edges: DataFrame) -> DataFrame:
    """One row (reciprocity double): the fraction of DISTINCT directed
    edges whose reverse edge is also present —
    ``networkx.overall_reciprocity`` semantics: self-loops stay in the
    DENOMINATOR but never count as reciprocated (NetworkX's
    (|E| − |und(E)|)·2 / |E| zeroes a loop's contribution), and an
    edge-free input yields NULL, matching SQL aggregate conventions
    (NetworkX raises there).

    One distinct pass + one self-semi-join on the reversed orientation +
    two single-row counts — every stage partial-aggregable, nothing
    grows past |E|.
    """
    e = edges.select("src", "dst").distinct().localCheckpoint(eager=True)
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    mutual = e.filter(F.col("src") != F.col("dst")).join(
        rev, ["src", "dst"], "left_semi"
    )
    total = e.agg(F.count("*").alias("n_edges"))
    mut = mutual.agg(F.count("*").alias("n_mutual"))
    return total.crossJoin(mut).select(
        F.try_divide(
            F.col("n_mutual").cast("double"), F.col("n_edges").cast("double")
        ).alias("reciprocity")
    )


def _cum_over_k(hist: DataFrame, val: str, cnt: str,
                chunk: int = 65536) -> DataFrame:
    """(k, total): for every integer k in [0, max(val)), the sum of
    ``cnt`` over histogram rows with ``val`` > k — the cumulative both
    rich-club curves need, computed WITHOUT exploding one O(max degree)
    array per row.  Sorted distinct values d_1 < … < d_m partition the
    k-axis into gaps [d_{i-1}, d_i); every k in a gap shares the same
    cumulative (the suffix sum from d_i up), so the explode is over GAP
    ranges, split into ≤``chunk``-element pieces — per-row array size is
    bounded by ``chunk`` no matter how extreme the hub degree, and the
    (unpartitioned) window runs over the ≤|distinct values|-row
    HISTOGRAM, never the data."""
    w = Window.orderBy(val).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    wc = Window.orderBy(val)
    g = hist.select(
        F.coalesce(F.lag(val).over(wc), F.lit(0)).alias("lo"),
        F.col(val).alias("hi"),
        (F.sum(cnt).over(w) - F.coalesce(
            F.sum(cnt).over(wc.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        )).alias("total"),
    )
    starts = g.select(
        F.explode(
            F.sequence(F.col("lo"), F.col("hi") - 1, F.lit(chunk))
        ).alias("c"),
        "hi",
        "total",
    )
    return starts.select(
        F.explode(
            F.sequence(
                F.col("c"), F.least(F.col("c") + (chunk - 1), F.col("hi") - 1)
            )
        ).alias("k"),
        "total",
    )


def rich_club(edges: DataFrame) -> DataFrame:
    """(k, phi): the rich-club coefficient phi(k) = 2·E_k/(N_k·(N_k−1))
    for every integer k with N_k ≥ 2, where N_k = #vertices of degree
    > k and E_k = #edges whose BOTH endpoints have degree > k (Colizza
    et al. 2006; semantics pinned to
    ``networkx.rich_club_coefficient(G, normalized=False)``).  High
    phi(k) at high k = the hub vertices form a densely wired core —
    exactly the AGATHA hub-term structure the skew machinery (G10)
    exists for, so this statistic is the diagnostic that says whether
    hub mitigation will matter on a given corpus graph.

    Scale shape: degrees and both histograms are partial-aggregable
    groupBys; the cumulative counts come from ``_cum_over_k``'s
    gap-ranged chunked explode over the HISTOGRAM — total explode mass
    is exactly max_degree rows per curve and per-row arrays are
    chunk-bounded, so a 10⁷-degree hub costs 10⁷ output rows (the
    size of phi itself), never a 10⁷-element in-row array.  Self-loops
    are dropped (networkx raises on them in this statistic).
    """
    e = canonical_undirected(edges)
    deg = (
        e.select(F.col("u").alias("x"))
        .unionByName(e.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count("*").alias("d"))
    )
    n_k = _cum_over_k(
        deg.groupBy("d").agg(F.count("*").alias("n")), "d", "n"
    ).withColumnRenamed("total", "n_k")
    md = (
        e.join(deg.select(F.col("x").alias("u"), F.col("d").alias("du")), "u")
        .join(deg.select(F.col("x").alias("v"), F.col("d").alias("dv")), "v")
        .select(F.least("du", "dv").alias("m"))
    )
    e_k = _cum_over_k(
        md.groupBy("m").agg(F.count("*").alias("c")), "m", "c"
    ).withColumnRenamed("total", "e_k")
    return (
        n_k.filter(F.col("n_k") >= 2)
        .join(e_k, "k", "left")
        .select(
            "k",
            (
                2.0 * F.coalesce(F.col("e_k"), F.lit(0))
                / (F.col("n_k") * (F.col("n_k") - F.lit(1.0)))
            ).alias("phi"),
        )
    )


def powerlaw_alpha(edges: DataFrame, dmin: int = 2) -> DataFrame:
    """(dmin, n_tail, alpha, sigma): the Clauset–Shalizi–Newman (2009)
    continuous-approximation MLE for the degree-distribution exponent,
    alpha = 1 + n / Σ_i ln(d_i / (dmin − ½)) over the n tail vertices
    with degree ≥ dmin, with the standard error sigma = (alpha−1)/√n
    (their eq. 3.1/3.2 — the ½-shift discrete correction).  This is the
    planning diagnostic for the skew machinery: alpha ≤ ~2.5 means hub
    degrees grow superlinearly with graph size, i.e. G10 hub mitigation
    and J9 salting are mandatory, not optional, at the target scale.

    Scale shape: one degree groupBy + one partial-aggregable (count,
    sum-of-ln) aggregate to a single row — no window, no sort, no
    driver loop.  An empty tail (every vertex below dmin) yields one
    row with n_tail = 0 and NULL alpha/sigma, the module's NULL
    convention for degenerate inputs (cf. assortativity on regular
    graphs).
    """
    if dmin < 1:
        raise ValueError(f"dmin must be >= 1, got {dmin}")
    e = canonical_undirected(edges)
    deg = (
        e.select(F.col("u").alias("x"))
        .unionByName(e.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count("*").alias("d"))
    )
    shift = float(dmin) - 0.5
    return (
        deg.filter(F.col("d") >= dmin)
        .agg(
            F.count("*").alias("n_tail"),
            F.sum(F.log(F.col("d") / F.lit(shift))).alias("s"),
        )
        .select(
            F.lit(dmin).alias("dmin"),
            "n_tail",
            (F.lit(1.0) + F.col("n_tail") / F.col("s")).alias("alpha"),
            (
                (F.col("n_tail") / F.col("s"))
                / F.sqrt(F.col("n_tail"))
            ).alias("sigma"),
        )
    )
