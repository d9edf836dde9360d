"""Benchmark harness — prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline: PageRank superstep throughput (edges-processed/sec, the
BASELINE.json north-star metric) on the co-occurrence graph extracted
from $SPARK_GRAFT_SF_DIR documents, plus wall-clock for representative
relational/dedup/graph queries.

Runs on local[$SPARK_GRAFT_CPUS] (default 32).  The two-parallelism
scaling-efficiency protocol (local[8] vs local[32], BASELINE.md) lives
in bench/scaling.py; this file is the driver's per-round feedback loop.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    from sparkgatha.session import get_spark
    from sparkgatha.extract import extract_cooccurrence_edges, node_ids, symmetrize
    from sparkgatha.graph.pagerank import pagerank
    from sparkgatha.graph.cc import connected_components
    from sparkgatha.graph.triangles import triangle_counts
    from sparkgatha.io import read_table
    import __spark_entry__ as entrymod

    spark = get_spark(
        "sparkgatha-bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "48g"},
    )

    queries: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.monotonic()
        out = fn()
        dt = time.monotonic() - t0
        queries[name] = round(dt, 3)
        return out

    # --- graph spine: extract → ids → PageRank ---------------------------
    docs = read_table(spark, SF_DIR, "documents")
    edges_raw = timed(
        "g1_extract_edges",
        lambda: symmetrize(
            extract_cooccurrence_edges(docs, text_col="text")
        ).localCheckpoint(eager=True),
    )
    n_edges = edges_raw.count()
    _, id_edges = node_ids(edges_raw)

    t0 = time.monotonic()
    pr = pagerank(id_edges, alpha=0.85, tol=0.0, max_iter=10, num_partitions=CPUS)
    pr_wall = time.monotonic() - t0
    queries["g4_pagerank_10_supersteps"] = round(pr_wall, 3)
    superstep_total = sum(pr.superstep_wall_s) or pr_wall
    edges_per_sec = n_edges * pr.iterations / superstep_total

    timed("g5_connected_components", lambda: connected_components(id_edges).count())
    timed("g7_triangle_counts", lambda: triangle_counts(id_edges).count())

    # --- representative registry queries ---------------------------------
    reg = entrymod.queries()
    for name in (
        "q_groupby_agg",
        "q_join_smj",
        "q_window_rank",
        "q_selfjoin_cooc",
        "q_dedup_exact",
        "q_dedup_minhash",
        "q_window_session",
        "q_knn_topk_per_vec",
    ):
        if name in reg:
            fn = reg[name]
            timed(name, lambda f=fn: f(spark, SF_DIR).count())

    total = round(sum(queries.values()), 3)
    print(
        json.dumps(
            {
                "metric": "pagerank_edges_processed_per_sec_per_superstep",
                "value": round(edges_per_sec, 1),
                "unit": "sec",
                "queries": queries,
                "sf": SF_DIR,
                "total_sec": total,
                "n_edges": n_edges,
                "supersteps": pr.iterations,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
