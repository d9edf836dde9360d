"""Property-based tests (hypothesis): randomized graph shapes beyond the
seeded goldens (SURVEY.md §5.2 L2).  Few examples, deterministic
(derandomize=True), tiny graphs — each example runs real Spark jobs."""

import networkx as nx
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from graph_helpers import nx_graph, to_spark_edges

SETTINGS = dict(
    max_examples=5,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@st.composite
def edge_lists(draw, max_n=24, max_m=48):
    """Undirected weighted edge list over vertices 0..n-1, no self-loops."""
    n = draw(st.integers(min_value=2, max_value=max_n))
    m = draw(st.integers(min_value=1, max_value=max_m))
    pairs = draw(
        st.lists(
            st.tuples(
                st.integers(0, n - 1),
                st.integers(0, n - 1),
                # allow_subnormal=False: a loaded native lib sets FTZ in
                # this env and hypothesis refuses subnormals under it
                st.floats(0.125, 4.0, allow_nan=False, width=32,
                          allow_subnormal=False),
            ),
            min_size=1, max_size=m,
        )
    )
    seen = {}
    for u, v, w in pairs:
        if u == v:
            continue
        seen[(min(u, v), max(u, v))] = round(float(w), 3)
    return [(a, b, w) for (a, b), w in sorted(seen.items())]


@given(triples=edge_lists())
@settings(**SETTINGS)
def test_prop_connected_components_match_networkx(spark, triples):
    if not triples:
        return
    from sparkgatha.graph import connected_components

    edges = to_spark_edges(spark, triples, symmetric=True)
    got = {
        r["vertex"]: r["component"]
        for r in connected_components(edges).collect()
    }
    g = nx_graph(triples)
    for comp in nx.connected_components(g):
        want = min(comp)
        for v in comp:
            assert got[v] == want, (v, got[v], want)


@given(triples=edge_lists(), data=st.data())
@settings(**SETTINGS)
def test_prop_pair_distance_matches_dijkstra(spark, triples, data):
    if not triples:
        return
    from sparkgatha.graph.paths import pair_distance

    verts = sorted({v for a, b, _ in triples for v in (a, b)})
    a = data.draw(st.sampled_from(verts))
    b = data.draw(st.sampled_from(verts))
    edges = to_spark_edges(spark, triples, symmetric=True)
    got = pair_distance(edges, a, b, max_iter=40)
    g = nx_graph(triples)
    try:
        want = nx.dijkstra_path_length(g, a, b, weight="weight")
    except nx.NetworkXNoPath:
        want = None
    if want is None:
        assert got is None
    else:
        assert got is not None and abs(got - want) < 1e-9, (a, b, got, want)


@given(triples=edge_lists())
@settings(**SETTINGS)
def test_prop_triangles_match_networkx(spark, triples):
    if not triples:
        return
    from sparkgatha.graph.triangles import global_triangle_count

    edges = to_spark_edges(spark, triples, symmetric=True)
    got = global_triangle_count(edges)
    want = sum(nx.triangles(nx_graph(triples)).values()) // 3
    assert got == want, (got, want)


@given(triples=edge_lists())
@settings(**SETTINGS)
def test_prop_lpa_matches_pinned_oracle(spark, triples):
    if not triples:
        return
    from graph_helpers import lpa_oracle

    from sparkgatha.graph import label_propagation

    edges = to_spark_edges(spark, triples, symmetric=True)
    got = {
        r["vertex"]: r["label"]
        for r in label_propagation(edges, max_iter=8).collect()
    }
    want = lpa_oracle(triples, max_iter=8)
    assert got == want


@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from("ab cd"), min_size=0, max_size=40
        ),
        min_size=1, max_size=12,
    )
)
@settings(**SETTINGS)
def test_prop_extraction_canonical_and_partition_invariant(spark, texts):
    """G1 edges are canonical (src < dst), weights are positive doc
    counts, and the result is identical at 1 vs 4 input partitions."""
    from sparkgatha.extract import extract_cooccurrence_edges

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    e1 = extract_cooccurrence_edges(
        docs.repartition(1), stopwords=()
    ).collect()
    e4 = extract_cooccurrence_edges(
        docs.repartition(4), stopwords=()
    ).collect()
    assert sorted(map(tuple, e1)) == sorted(map(tuple, e4))
    n_docs = len(texts)
    for r in e1:
        assert r["src"] < r["dst"]
        assert 1.0 <= r["weight"] <= n_docs


@given(triples=edge_lists())
@settings(**SETTINGS)
def test_prop_louvain_partition_valid_and_conserves_weight(spark, triples):
    """Multi-level Louvain on random graphs: every vertex mapped exactly
    once, community representatives are graph vertices, and each level's
    contraction conserves total weight."""
    if not triples:
        return
    from sparkgatha.graph.louvain import louvain, louvain_level

    edges = spark.createDataFrame(
        [(str(a), str(b), w) for a, b, w in triples],
        "src string, dst string, weight double",
    )
    verts = {str(a) for a, _, _ in triples} | {str(b) for _, b, _ in triples}
    rows = louvain(edges, max_levels=3).collect()
    got = {r["vertex"]: r["community"] for r in rows}
    assert set(got) == verts and len(rows) == len(verts)
    assert set(got.values()) <= verts
    labels, coarse = louvain_level(edges)
    if labels is not None:
        tin = sum(w for _, _, w in triples)
        tout = coarse.agg(F.sum("weight")).collect()[0][0]
        assert abs(tin - tout) < 1e-6 * max(tin, 1.0)


@given(triples=edge_lists())
@settings(**SETTINGS)
def test_prop_simrank_bounds_and_symmetric_inputs(spark, triples):
    """SimRank invariants on random graphs: canonical a < b output, all
    scores in (0, C], and a vertex pair with identical neighbor sets
    reaches exactly C = s(a,b) = C/(d·d) · Σ s(u,u) when N(a) == N(b)
    is a single shared neighbor."""
    if not triples:
        return
    from sparkgatha.graph.simrank import simrank

    edges = to_spark_edges(spark, triples, symmetric=True)
    rows = simrank(edges, c=0.8, iters=2, top=64).collect()
    for r in rows:
        assert r["a"] < r["b"]
        assert 0.0 < r["score"] <= 0.8 + 1e-9


def test_simrank_twins_hit_c_exactly(spark):
    """Two leaves hanging off one hub have identical singleton neighbor
    sets: s1(leaf1, leaf2) = C/(1·1)·s0(hub,hub) = C exactly."""
    from sparkgatha.graph.simrank import simrank

    edges = to_spark_edges(
        spark, [(1, 0, 1.0), (2, 0, 1.0)], symmetric=True
    )
    got = {(r["a"], r["b"]): r["score"]
           for r in simrank(edges, c=0.8, iters=1, top=8).collect()}
    assert got[(1, 2)] == 0.8


@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=3, max_size=40),
        min_size=2, max_size=12,
    )
)
@settings(**SETTINGS)
def test_prop_sorted_neighborhood_sound(spark, texts):
    """SNM soundness on random corpora: every reported pair really has
    shingle-set Jaccard >= the threshold (completeness is only within
    the rank window, by design)."""
    from sparkgatha.dedup import N_SHINGLE, sorted_neighborhood_pairs

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = sorted_neighborhood_pairs(
        docs, window=4, threshold=0.5, num_partitions=2
    ).collect()

    def sh(t):
        toks = [x for x in t.lower().strip().split() if x]
        if len(toks) >= N_SHINGLE:
            return {
                " ".join(toks[i : i + N_SHINGLE])
                for i in range(len(toks) - N_SHINGLE + 1)
            }
        return {" ".join(toks)}

    for r in got:
        a, b = sh(texts[r["doc_a"]]), sh(texts[r["doc_b"]])
        j = len(a & b) / len(a | b)
        assert round(j, 4) >= 0.5, (r, a, b)
