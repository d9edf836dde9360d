"""G40 — SimRank structural similarity (Jeh & Widom, KDD 2002) over a
top-degree induced subgraph.

SimRank's recurrence  s(a,b) = C/(|N(a)||N(b)|) · Σ_{u∈N(a),v∈N(b)} s(u,v)
is inherently quadratic in the pair space, so no production system runs
it over a full 10^12-edge graph: every scalable use restricts it to a
candidate vertex set (query-time single-pair push, or an induced
subgraph around the entities of interest).  This operator pins the
deterministic batch variant of that practice: induce the subgraph on the
``top`` highest-degree vertices (ties broken by vertex key — the hub
terms SimRank is most often asked about in a co-occurrence graph), then
iterate the recurrence a fixed number of synchronous rounds.

Determinism for the cross-engine oracle: degrees are exact integers, the
top-k cut uses (degree desc, vertex asc), and the state is carried as
``s8 = round(score · 10⁸)`` — an exact LONG.  Sums of longs are
order-independent (unlike the rounded-double trick G6/G39 use, which
still leaves last-ulp summation-order noise that can flip a HALF_UP
boundary), and each round's update ``round(c · m8 / (dₐ·d_b))`` is one
double expression over identical integers in every engine — bit-stable
across runs and engines, not just usually-equal.

Scale shape: the state s_k(x, y, s) is a DataFrame; one round is two
joins against the stationary induced edge list plus one groupBy (the
same gather-scatter shape as every superstep here), with the per-round
state lazily localCheckpoint'd so each materializes exactly once.  The
``top`` knob is the explicit cost guard (capped at 4096): pair state is
O(top²) by design, never O(|V|²) by accident.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

TOP_CAP = 4096


def simrank(
    edges: DataFrame,
    c: float = 0.8,
    iters: int = 2,
    top: int = 64,
) -> DataFrame:
    """(a, b, score) — SimRank after ``iters`` synchronous rounds on the
    induced subgraph of the ``top`` highest-degree vertices of the
    symmetrized, deduplicated, self-loop-free neighbor graph.  Output is
    canonical ``a < b`` with ``score > 0`` (the diagonal is 1 by
    definition and omitted); neighbor sets are unweighted per the
    classic definition."""
    if top > TOP_CAP:
        raise ValueError(
            f"simrank: top={top} exceeds the {TOP_CAP} guard — pair "
            "state is O(top^2); restrict the candidate set"
        )
    base = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    und = (
        base.unionByName(
            base.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=True)  # feeds degree rank + induced cut
    )
    deg = und.groupBy("src").agg(F.count("*").alias("d"))
    topv = (
        deg.orderBy(F.col("d").desc(), F.col("src").asc())
        .limit(top)
        .select(F.col("src").alias("v"))
        .localCheckpoint(eager=True)
    )
    # induced edges: both endpoints in the top set (≤ `top` rows each
    # side — always broadcastable by construction)
    sub = (
        und.join(F.broadcast(topv.select(F.col("v").alias("src"))), "src")
        .join(F.broadcast(topv.select(F.col("v").alias("dst"))), "dst")
        .select("src", "dst")
        .localCheckpoint(eager=True)
    )
    sd = sub.groupBy("src").agg(F.count("*").alias("d"))
    verts = sub.select(F.col("src").alias("v")).distinct()
    # state s8 = score * 1e8 as an exact long (see module docstring);
    # max m8 ≈ top² · 1e8 ≈ 1.7e15 at the 4096 cap — well inside long
    diag = verts.select(
        F.col("v").alias("x"),
        F.col("v").alias("y"),
        F.lit(100_000_000).cast("long").alias("s8"),
    )
    e1 = sub.select(F.col("src").alias("a"), F.col("dst").alias("u"))
    e2 = sub.select(F.col("src").alias("b"), F.col("dst").alias("v"))
    dd1 = sd.select(F.col("src").alias("a"), F.col("d").alias("da"))
    dd2 = sd.select(F.col("src").alias("b"), F.col("d").alias("db"))
    state = diag
    for _ in range(max(iters, 0)):
        m = (
            e1.join(state, e1.u == state.x)
            .join(e2, state.y == e2.v)
            .groupBy("a", "b")
            .agg(F.sum("s8").alias("m8"))
        )
        nondiag = (
            m.join(F.broadcast(dd1), "a")
            .join(F.broadcast(dd2), "b")
            .filter(F.col("a") != F.col("b"))
            .select(
                F.col("a").alias("x"),
                F.col("b").alias("y"),
                F.round(
                    F.lit(c) * F.col("m8") / (F.col("da") * F.col("db")), 0
                )
                .cast("long")
                .alias("s8"),
            )
            .filter(F.col("s8") > 0)
        )
        state = diag.unionByName(nondiag).localCheckpoint(eager=False)
    return state.filter(F.col("x") < F.col("y")).select(
        F.col("x").alias("a"),
        F.col("y").alias("b"),
        (F.col("s8") / F.lit(100_000_000.0)).alias("score"),
    )
