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
