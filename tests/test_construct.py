"""Entry-point parity tests: construct pipeline (checkpoint-skip),
topic query, pair features (SURVEY.md §3.1–3.3)."""

import pytest
from pyspark.sql import functions as F

from sparkgatha.construct import ConstructConfig, build_graph, load_adjacency
from sparkgatha.corpus import generate_corpus
from sparkgatha.query import pair_features, topic_query


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("graph"))
    corpus_dir = out + "/corpus"
    generate_corpus(spark, 300, num_partitions=4).write.mode(
        "overwrite"
    ).parquet(corpus_dir)
    cfg = ConstructConfig(
        corpus_path=corpus_dir,
        out_dir=out + "/g",
        text_col="content",
        max_df=0.9,
        num_partitions=8,
    )
    r1 = build_graph(spark, cfg)
    return spark, cfg, r1


def test_build_graph_phases(built):
    spark, cfg, r1 = built
    assert r1.n_edges > 0 and r1.n_nodes > 0
    assert r1.skipped == []
    nodes, edges = load_adjacency(spark, cfg.out_dir)
    # adjacency is symmetrized: both orientations present
    a = edges.select("src", "dst")
    b = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    assert a.exceptAll(b).count() == 0
    assert nodes.count() == r1.n_nodes


def test_build_graph_checkpoint_skip(built):
    spark, cfg, r1 = built
    r2 = build_graph(spark, cfg)  # re-run: all phases skipped
    assert set(r2.skipped) == {"edges", "nodes", "adjacency"}
    assert r2.n_edges == r1.n_edges and r2.n_nodes == r1.n_nodes


def test_topic_query(built):
    spark, cfg, _ = built
    nodes, edges = load_adjacency(spark, cfg.out_dir)
    # two vocabulary terms guaranteed present (corpus vocab)
    r = topic_query(spark, nodes, edges, "util", "test")
    assert r.distance is not None and r.distance > 0
    ranked = r.ranked_terms.collect()
    assert len(ranked) >= 2
    # endpoints are near-path by definition; the built graph stores
    # typed multigraph keys (entity_types: t:<term>)
    keys = {x["key"] for x in ranked}
    assert {"t:util", "t:test"} <= keys
    assert r.path_neighborhood.count() > 0


def test_topic_rank_seeds_dominate(built):
    """Personalized-PageRank topic ranking: the seed terms carry the
    teleport mass, so they must outrank their uniform-PageRank position
    and appear in the top ranks."""
    from sparkgatha.query import topic_rank

    spark, cfg, _ = built
    nodes, edges = load_adjacency(spark, cfg.out_dir)
    out = topic_rank(spark, nodes, edges, ["util", "test"], top_k=10)
    rows = out.collect()
    keys = [r["key"] for r in rows]
    assert {"t:util", "t:test"} <= set(keys)
    # seeds hold the top-2 slots on this small graph
    assert set(keys[:2]) == {"t:util", "t:test"}
    # ranks are a probability-like ordering
    ranks = [r["rank"] for r in rows]
    assert ranks == sorted(ranks, reverse=True) and ranks[0] > 0


def test_topic_query_unknown_term(built):
    spark, cfg, _ = built
    nodes, edges = load_adjacency(spark, cfg.out_dir)
    with pytest.raises(KeyError):
        topic_query(spark, nodes, edges, "util", "no_such_term_xyz")


def test_pair_features(built):
    spark, cfg, _ = built
    nodes, edges = load_adjacency(spark, cfg.out_dir)
    pairs = spark.createDataFrame(
        [("util", "test"), ("config", "core")], "term_a string, term_b string"
    )
    f = pair_features(spark, nodes, edges, pairs, max_iter=10).collect()
    assert len(f) == 2
    for r in f:
        assert r["rank_a"] > 0 and r["rank_b"] > 0
        assert r["degree_a"] > 0
        assert r["same_component"] in (True, False)


def test_typed_node_keys_and_helpers(built):
    """Typed multigraph keys (reference entity_types analog): every
    term node in the built graph carries the t: prefix; the kind /
    strip helpers round-trip typed keys and pass legacy untyped keys
    through unchanged."""
    from sparkgatha.entity_types import (
        TERM_TYPE, is_kind, node_kind, strip_kind,
    )

    spark, cfg, _ = built
    nodes, _ = load_adjacency(spark, cfg.out_dir)
    assert nodes.filter(~is_kind("key", TERM_TYPE)).count() == 0
    kinds = {r["k"] for r in nodes.select(node_kind("key").alias("k")).distinct().collect()}
    assert kinds == {TERM_TYPE}
    assert nodes.filter(strip_kind("key").startswith("t:")).count() == 0
    mixed = spark.createDataFrame(
        [("util",), ("v:7",), ("t:x",), ("no:kind",)], "key string"
    )
    got = {
        r["key"]: (r["k"], r["r"])
        for r in mixed.select(
            "key", node_kind("key").alias("k"), strip_kind("key").alias("r")
        ).collect()
    }
    assert got["util"] == ("t", "util")      # legacy raw term
    assert got["v:7"] == ("v", "7")
    assert got["t:x"] == ("t", "x")
    assert got["no:kind"] == ("t", "no:kind")  # unknown prefix = raw term


def test_untyped_legacy_graph_still_queryable(spark, tmp_path):
    """typed_nodes=False builds the pre-round-4 raw-key graph; the
    query surface (raw-term lookup, pair_features join) works on both
    generations."""
    corpus_dir = str(tmp_path / "c")
    generate_corpus(spark, 100, num_partitions=2).write.parquet(corpus_dir)
    cfg = ConstructConfig(
        corpus_path=corpus_dir,
        out_dir=str(tmp_path / "g"),
        text_col="content",
        num_partitions=4,
        typed_nodes=False,
    )
    build_graph(spark, cfg)
    nodes, edges = load_adjacency(spark, cfg.out_dir)
    assert nodes.filter(F.col("key").startswith("t:")).count() == 0
    r = topic_query(spark, nodes, edges, "util", "test")
    assert r.distance is not None
    assert {"util", "test"} <= {x["key"] for x in r.ranked_terms.collect()}


def test_pair_features_sim_nodes_do_not_collide(spark):
    """A term 't:42' and a sim node 'v:42' must NOT collapse onto one
    joined key — pair_features restricts to term-kind nodes before
    stripping prefixes (regression: stripping alone fanned the pairs
    join out with sim-node feature rows)."""
    nodes = spark.createDataFrame(
        [(1, "t:42"), (2, "v:42"), (3, "t:x")], "id long, key string"
    )
    edges = spark.createDataFrame(
        [(1, 2, 1.0), (2, 1, 1.0), (1, 3, 1.0), (3, 1, 1.0)],
        "src long, dst long, weight double",
    )
    pairs = spark.createDataFrame([("42", "x")], "term_a string, term_b string")
    out = pair_features(spark, nodes, edges, pairs, max_iter=5).collect()
    assert len(out) == 1  # exactly one feature row per input pair


def test_build_graph_with_similarity_edges(spark, tmp_path):
    """G8 wired into construction: with an embeddings table the build
    adds kNN similarity edges between v:<vec_id> nodes (the reference's
    FAISS sentence-kNN edges), the graph stays heterogeneous, and the
    checkpoint-skip covers the new phase."""
    corpus_dir = str(tmp_path / "c")
    generate_corpus(spark, 200, num_partitions=4).write.parquet(corpus_dir)
    cfg = ConstructConfig(
        corpus_path=corpus_dir,
        out_dir=str(tmp_path / "g"),
        text_col="content",
        num_partitions=4,
        embeddings_path="/root/testdata/sf0.001/embeddings.parquet",
        knn_k=3,
    )
    r1 = build_graph(spark, cfg)
    assert r1.n_sim_edges > 0
    nodes, edges = load_adjacency(spark, cfg.out_dir)
    sim_nodes = nodes.filter(F.col("key").startswith("v:"))
    term_nodes = nodes.filter(~F.col("key").startswith("v:"))
    assert sim_nodes.count() > 0 and term_nodes.count() > 0  # heterogeneous
    # per-query cap respected: at most k out-edges per v: node pre-symmetrize
    sim_raw = spark.read.parquet(cfg.out_dir + "/sim_edges")
    per_q = sim_raw.groupBy("src").count()
    assert per_q.agg(F.max("count")).collect()[0][0] <= cfg.knn_k
    # weights are positive cosines
    assert sim_raw.filter(F.col("weight") <= 0).count() == 0
    r2 = build_graph(spark, cfg)
    assert set(r2.skipped) == {"edges", "similarity", "nodes", "adjacency"}
    assert r2.n_sim_edges == r1.n_sim_edges


def test_cli_construct_and_query(spark, tmp_path):
    """__main__ surface — the spark-submit command shape."""
    corpus_dir = str(tmp_path / "c")
    generate_corpus(spark, 150, num_partitions=2).write.parquet(corpus_dir)
    import sparkgatha.__main__ as cli

    assert (
        cli.main(
            ["construct", "--corpus", corpus_dir, "--out", str(tmp_path / "g"),
             "--partitions", "4"]
        )
        == 0
    )
    assert (
        cli.main(
            ["pagerank", "--graph", str(tmp_path / "g"), "--out",
             str(tmp_path / "r"), "--max-iter", "5", "--partitions", "4"]
        )
        == 0
    )
    ranks = spark.read.parquet(str(tmp_path / "r"))
    assert ranks.count() > 0
    assert abs(ranks.agg(F.sum("rank")).collect()[0][0] - 1.0) < 1e-9
    for cmd in ("cc", "lpa"):
        assert (
            cli.main(
                [cmd, "--graph", str(tmp_path / "g"), "--out",
                 str(tmp_path / cmd), "--partitions", "4"]
            )
            == 0
        )
        labels = spark.read.parquet(str(tmp_path / cmd))
        assert labels.count() > 0
        assert set(labels.columns) == {"key", "label"}
    assert (
        cli.main(
            ["topicrank", "--graph", str(tmp_path / "g"),
             "--terms", "util,test", "--top-k", "5"]
        )
        == 0
    )
    assert (
        cli.main(
            ["query", "--graph", str(tmp_path / "g"),
             "--a", "util", "--b", "test", "--distance-only"]
        )
        == 0
    )
    assert (
        cli.main(
            ["walks", "--graph", str(tmp_path / "g"), "--out",
             str(tmp_path / "w"), "--length", "5"]
        )
        == 0
    )
    walks = spark.read.parquet(str(tmp_path / "w"))
    assert walks.count() > 0
    assert set(walks.columns) == {"walk_id", "terms"}
    # symmetrized graph → no sinks → every walk has the full length+1
    assert walks.filter(F.size("terms") != 6).count() == 0
    assert (
        cli.main(
            ["walks", "--graph", str(tmp_path / "g"), "--out",
             str(tmp_path / "w2"), "--length", "5", "--p", "2.0",
             "--q", "0.5"]
        )
        == 0
    )
    bw = spark.read.parquet(str(tmp_path / "w2"))
    assert bw.count() == walks.count()  # same starts, full length
    assert bw.filter(F.size("terms") != 6).count() == 0
    assert (
        cli.main(
            ["walks", "--graph", str(tmp_path / "g"), "--out",
             str(tmp_path / "w3"), "--length", "5", "--weighted"]
        )
        == 0
    )
    ww = spark.read.parquet(str(tmp_path / "w3"))
    assert ww.count() == walks.count()  # same starts, full length
    assert ww.filter(F.size("terms") != 6).count() == 0
    with pytest.raises(SystemExit, match="incompatible"):
        cli.main(
            ["walks", "--graph", str(tmp_path / "g"), "--out",
             str(tmp_path / "w4"), "--weighted", "--p", "2.0",
             "--q", "0.5"]
        )
    assert (
        cli.main(
            ["profile", "--graph", str(tmp_path / "g"), "--out",
             str(tmp_path / "p")]
        )
        == 0
    )
    prof = spark.read.parquet(str(tmp_path / "p"))
    assert prof.count() > 0
    assert set(prof.columns) == {"key", "degree", "n_triangles", "clustering"}
    bad = prof.filter(
        (F.col("clustering") < 0) | (F.col("clustering") > 1)
    ).count()
    assert bad == 0
    # degree, triangles, and clustering must be mutually consistent:
    # clustering == 2T/(d(d-1)) — catches double-counted degrees on the
    # symmetrized adjacency
    for r in prof.collect():
        d, t = r["degree"], r["n_triangles"]
        want = 2.0 * t / (d * (d - 1)) if d >= 2 else 0.0
        assert abs(r["clustering"] - want) < 1e-12, r


def test_cli_backbone_mis_centrality(spark, tmp_path):
    """The round-4 export commands: MSF backbone, MIS thinning, and
    eigenvector centrality over a built graph."""
    import sparkgatha.__main__ as cli

    corpus_dir = str(tmp_path / "c")
    generate_corpus(spark, 150, num_partitions=2).write.parquet(corpus_dir)
    g = str(tmp_path / "g")
    assert cli.main(["construct", "--corpus", corpus_dir, "--out", g,
                     "--partitions", "4"]) == 0

    assert cli.main(["backbone", "--graph", g,
                     "--out", str(tmp_path / "bb")]) == 0
    bb = spark.read.parquet(str(tmp_path / "bb"))
    from sparkgatha.construct import load_adjacency
    nodes, edges = load_adjacency(spark, g)
    n_vertices = nodes.count()
    # spanning forest: |E| = |V| - #components, and here <= |V| - 1
    assert 0 < bb.count() <= n_vertices - 1
    assert set(bb.columns) == {"key_u", "key_v", "weight"}

    assert cli.main(["mis", "--graph", g, "--out", str(tmp_path / "m"),
                     "--seed", "3"]) == 0
    m = spark.read.parquet(str(tmp_path / "m"))
    assert 0 < m.count() <= n_vertices
    # independence spot-check against the stored adjacency
    mem = {r["key"] for r in m.collect()}
    ek = (edges.join(nodes.select(F.col("id").alias("src"),
                                  F.col("key").alias("ku")), "src")
          .join(nodes.select(F.col("id").alias("dst"),
                             F.col("key").alias("kv")), "dst")
          .select("ku", "kv").collect())
    assert not any(r["ku"] in mem and r["kv"] in mem for r in ek)

    assert cli.main(["centrality", "--graph", g,
                     "--out", str(tmp_path / "ce"),
                     "--max-iter", "30"]) == 0
    ce = spark.read.parquet(str(tmp_path / "ce"))
    assert ce.count() == n_vertices
    assert abs(ce.agg(F.sum("score")).collect()[0][0] - 1.0) < 1e-9


def test_cli_pack_louvain_ann(spark, tmp_path):
    """The ninth-session export commands: sequence packing (both
    modes), the Louvain move round, and the quantized ANN methods."""
    import json as _json

    import sparkgatha.__main__ as cli

    corpus_dir = str(tmp_path / "c")
    generate_corpus(spark, 120, num_partitions=2).write.parquet(corpus_dir)

    for mode in ("chunks", "bins"):
        out = str(tmp_path / f"pk_{mode}")
        assert cli.main([
            "pack", "--corpus", corpus_dir, "--out", out,
            "--mode", mode, "--capacity", "64", "--shards", "4",
        ]) == 0
        pk = spark.read.parquet(out)
        assert pk.count() > 0
        unit = "chunk" if mode == "chunks" else "bin"
        assert {"shard", unit, "doc_id"} <= set(pk.columns)
        if mode == "bins":
            # capacity respected for multi-doc bins
            fills = (
                pk.groupBy("shard", "bin")
                .agg(F.sum("n").alias("f"), F.count("*").alias("c"))
                .collect()
            )
            assert all(r["f"] <= 64 or r["c"] == 1 for r in fills)

    g = str(tmp_path / "g")
    assert cli.main(["construct", "--corpus", corpus_dir, "--out", g,
                     "--partitions", "4"]) == 0
    lv = str(tmp_path / "lv")
    assert cli.main(["louvain", "--graph", g, "--out", lv]) == 0
    mv = spark.read.parquet(lv)
    assert mv.count() > 0
    assert set(mv.columns) == {"key", "move_to_key", "gain"}
    assert mv.filter(F.col("gain") < 0).count() == 0

    # full multi-level mode: every vertex mapped, communities shrink
    lvm = str(tmp_path / "lvm")
    assert cli.main(["louvain", "--graph", g, "--out", lvm,
                     "--levels", "3"]) == 0
    cm = spark.read.parquet(lvm)
    assert set(cm.columns) == {"key", "community_key"}
    assert cm.count() == mv.count()
    assert cm.select("community_key").distinct().count() < cm.count()

    emb = str(tmp_path / "e")
    rows = [(i, [float(((i * 7 + j * 3) % 13) - 6) for j in range(8)])
            for i in range(60)]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).write.parquet(emb)
    for method in ("sq8", "pq", "ivfpq"):
        out = str(tmp_path / f"ann_{method}")
        assert cli.main([
            "ann", "--embeddings", emb, "--out", out,
            "--method", method, "--k", "3", "--dim", "8",
            "--queries", "6",
        ]) == 0
        a = spark.read.parquet(out)
        assert set(a.columns) == {"qid", "nid", "cos"}
        assert a.count() > 0


def test_cli_sql_passthrough(spark, tmp_path):
    """`sql` command: views registered, query runs, --out round-trips."""
    import json as _json

    import sparkgatha.__main__ as cli

    out = str(tmp_path / "sqlout")
    assert cli.main([
        "sql", "--sf-dir", "/root/testdata/sf0.001",
        "--query",
        "SELECT r_name, count(*) AS n FROM region GROUP BY r_name",
        "--out", out,
    ]) == 0
    got = spark.read.parquet(out)
    assert got.count() == 5
    assert set(got.columns) == {"r_name", "n"}
