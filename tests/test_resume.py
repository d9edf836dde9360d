"""L5 — checkpoint/resume: PageRank interrupted after iteration k and
resumed must produce the SAME final state (bitwise on the fingerprint)
as the uninterrupted run (SURVEY.md §5.2 L5)."""

from graph_helpers import random_graph, to_spark_edges

from sparkgatha.graph.metrics import state_fingerprint
from sparkgatha.graph.pagerank import pagerank


def test_resume_equals_uninterrupted(spark, tmp_path):
    triples = random_graph(n=80, m=240, seed=11)
    edges = to_spark_edges(spark, triples, symmetric=True)

    full_dir = str(tmp_path / "full")
    r_full = pagerank(
        edges, tol=0.0, max_iter=8, checkpoint_dir=full_dir, checkpoint_every=2
    )

    # interrupted: stop after 4 iterations, durable every 2
    part_dir = str(tmp_path / "part")
    pagerank(
        edges, tol=0.0, max_iter=4, checkpoint_dir=part_dir, checkpoint_every=2
    )
    # resume and continue to 8
    r_res = pagerank(
        edges,
        tol=0.0,
        max_iter=8,
        checkpoint_dir=part_dir,
        checkpoint_every=2,
        resume=True,
    )

    fp_full = state_fingerprint(r_full.ranks)
    fp_res = state_fingerprint(r_res.ranks)
    assert fp_full == fp_res
    assert r_res.iterations == 8


def test_manifest_and_metrics_written(spark, tmp_path):
    import json
    import os

    triples = random_graph(n=40, m=100, seed=5)
    edges = to_spark_edges(spark, triples, symmetric=True)
    d = str(tmp_path / "ck")
    r = pagerank(
        edges, tol=0.0, max_iter=3, checkpoint_dir=d, checkpoint_every=1,
        with_lineage=True,
    )
    assert r.iterations == 3
    for it in (1, 2, 3):
        m = json.load(open(os.path.join(d, f"it={it}", "_MANIFEST.json")))
        assert m["iteration"] == it
        assert m["lineage_sha"]
        assert "delta_l1" in m["metrics"]
        assert len(m["partitions"]) >= 1  # per-partition lineage rows
    # metrics sink wrote one row per superstep
    lines = open(os.path.join(d, "_metrics.jsonl")).read().strip().splitlines()
    assert len(lines) == 3


def test_lineage_sha_stable_across_partitionings(spark):
    triples = random_graph(n=50, m=150, seed=9)
    e4 = to_spark_edges(spark, triples, symmetric=True).repartition(4)
    e16 = to_spark_edges(spark, triples, symmetric=True).repartition(16)
    r4 = pagerank(e4, tol=0.0, max_iter=5, num_partitions=4)
    r16 = pagerank(e16, tol=0.0, max_iter=5, num_partitions=16)
    # partitioning-insensitive fingerprint: same logical state, same sha
    assert state_fingerprint(r4.ranks) == state_fingerprint(r16.ranks)
