"""Benchmark harness — prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline metric (BASELINE.json north-star): PageRank
edges-processed/sec per superstep on bench input B — the seeded
power-law graph (2x10^7 edges, hub ≈ 30%, FIXTURES.md §B).

Protocol (matches BENCH/BASELINE.md):
  * the edge layout is prepared ONCE (prepare_pagerank: G11 layout +
    G10 mirroring, persisted and materialized) — layout cost is
    reported separately as b_pagerank_prepare, never inside a
    superstep wall;
  * a 3-superstep JIT warm-up run is discarded;
  * 5 measured runs ($SPARK_GRAFT_RUNS) x 10 supersteps on the warm
    layout; the headline is the MEDIAN per-run throughput (edges x
    supersteps / sum of superstep walls); best-of-N rides alongside as
    value_best and every raw per-run throughput is in the JSON.

Also timed: the co-occurrence extraction spine on input A
($SPARK_GRAFT_SF_DIR documents), the other graph algorithms, and
representative relational/dedup/similarity queries.

Runs on local[$SPARK_GRAFT_CPUS] (default 32).  The two-parallelism
scaling-efficiency protocol (local[8] vs local[32]) is bench/scaling.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_EDGES_B = int(os.environ.get("SPARK_GRAFT_EDGES", "20000000"))
WARMUP_STEPS = 3
MEASURED_STEPS = 10
MEASURED_RUNS = int(os.environ.get("SPARK_GRAFT_RUNS", "5"))


def main() -> None:
    from sparkgatha.session import get_spark
    from sparkgatha.extract import extract_cooccurrence_edges, node_ids, symmetrize
    from sparkgatha.graph.pagerank import pagerank, prepare_pagerank
    from sparkgatha.graph.cc import connected_components
    from sparkgatha.graph.lpa import label_propagation
    from sparkgatha.graph.triangles import triangle_counts
    from sparkgatha.graph.mst import minimum_spanning_forest
    from sparkgatha.graph.walks import random_walks
    from sparkgatha.io import read_table
    from sparkgatha.synthetic import powerlaw_edges
    import __spark_entry__ as entrymod

    spark = get_spark(
        "sparkgatha-bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "12g"},
    )

    queries: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.monotonic()
        out = fn()
        queries[name] = round(time.monotonic() - t0, 3)
        return out

    # --- input B: power-law graph, the north-star metric -----------------
    edges_b = timed(
        "b_generate_powerlaw",
        lambda: powerlaw_edges(
            spark, N_EDGES_B, num_partitions=CPUS
        ).localCheckpoint(eager=True),
    )
    n_edges_b = edges_b.count()

    prep = timed(
        "b_pagerank_prepare",
        lambda: prepare_pagerank(edges_b, num_partitions=CPUS),
    )
    # JIT warm-up, discarded; measured runs fuse all supersteps into one
    # Spark job (check_every, bit-identical numerics — pagerank module doc)
    pagerank(prepared=prep, tol=0.0, max_iter=WARMUP_STEPS, check_every=WARMUP_STEPS)
    runs = []
    for _ in range(MEASURED_RUNS):
        t0 = time.monotonic()
        r = pagerank(
            prepared=prep, tol=0.0, max_iter=MEASURED_STEPS,
            check_every=MEASURED_STEPS,
        )
        runs.append((time.monotonic() - t0, r))
    # second half of the north-star metric: iterations to the 1e-6
    # NetworkX stopping rule on the same warm layout
    conv = timed(
        "b_pagerank_converge_1e6",
        lambda: pagerank(prepared=prep, tol=1e-6, max_iter=100),
    )
    prep.unpersist()
    tput = lambda r: n_edges_b * r.iterations / sum(r.superstep_wall_s)  # noqa: E731
    runs.sort(key=lambda wr: tput(wr[1]))
    wall_med, pr = runs[len(runs) // 2]  # median-throughput run
    queries["b_pagerank_10_supersteps"] = round(wall_med, 3)
    edges_per_sec = tput(pr)
    run_tputs = [round(tput(r), 1) for _, r in runs]

    # the beyond-broadcast path (>2e7-vertex regime) on the same input:
    # src-partitioned layout + hot-src salting; timed so a straggler in
    # the salted window/agg shows up as a wall regression round-over-round
    prep_sh = timed(
        "b_pagerank_prepare_shuffle",
        lambda: prepare_pagerank(edges_b, num_partitions=CPUS,
                                 strategy="shuffle"),
    )
    timed(
        "b_pagerank_shuffle_5_supersteps",
        lambda: pagerank(prepared=prep_sh, tol=0.0, max_iter=5),
    )
    prep_sh.unpersist()

    timed("b_connected_components", lambda: connected_components(edges_b).count())
    timed("b_triangle_counts", lambda: triangle_counts(edges_b).count())
    timed(
        "b_lpa_5_supersteps",
        lambda: label_propagation(
            edges_b, max_iter=5, num_partitions=CPUS, check_every=5
        ).count(),
    )
    # walk-corpus generation at scale: ~2e6 walks (one per vertex), the
    # frontier-only-shuffle superstep shape (graph/walks.py)
    timed(
        "b_random_walks_5",
        lambda: random_walks(edges_b, length=5).count(),
    )
    # Borůvka MSF on its own fixed 2e6-edge slice (seeded, distinct from
    # input B only in size): the full 2e7-edge input would double the
    # bench wall for one cell — the contraction rounds + nested G5
    # closures are the cost being tracked, and they show at 2e6 too
    edges_m = powerlaw_edges(
        spark, 2_000_000, num_partitions=CPUS
    ).localCheckpoint(eager=True)
    timed(
        "b_msf_2m",
        lambda: minimum_spanning_forest(edges_m).count(),
    )
    # multi-level Louvain on the same 2e6 slice: per level one move
    # round + CC-of-move-graph + contraction — the agglomeration cost
    # being tracked (G43)
    from sparkgatha.graph.louvain import louvain

    timed(
        "b_louvain_2level_2m",
        lambda: louvain(edges_m, max_levels=2).count(),
    )

    # --- input A: extraction spine + algorithms on the documents graph ---
    docs = read_table(spark, SF_DIR, "documents")
    edges_a = timed(
        "g1_extract_edges",
        lambda: symmetrize(
            extract_cooccurrence_edges(docs, text_col="text")
        ).localCheckpoint(eager=True),
    )
    _, id_edges = node_ids(edges_a)
    timed(
        "a_pagerank_converged",
        lambda: pagerank(id_edges, tol=1e-9, max_iter=60).ranks.count(),
    )
    timed("a_triangle_counts", lambda: triangle_counts(id_edges).count())

    # --- representative registry queries ---------------------------------
    reg = entrymod.queries()
    for name in (
        "q_groupby_agg",
        "q_join_smj",
        "q_window_rank",
        "q_selfjoin_cooc",
        "q_dedup_exact",
        "q_dedup_minhash",
        "q_dedup_ngram_jaccard",
        "q_window_session",
        "q_knn_topk_per_vec",
        "q_ivf_topk",
        "q_clean_corpus",
        "q_near_dup_clusters",
        "q_g4_pagerank_personalized",
        "q_k_core",
        "q_hits",
        "q_clustering_coeff",
        "q_random_walks",
        "q_betweenness",
        "q_ego_2hop",
        "q_scc",
        "q_hop_neighborhood",
        "q_anf_sketch",
        "q_assortativity",
        "q_k_truss",
        "q_harmonic",
        "q_eigenvector",
        "q_edge_similarity",
        "q_msf",
        "q_mis",
        "q_condensation",
        "q_coloring",
        "q_matching",
        "q_densest",
        "q_katz",
        "q_closeness",
        "q_transitivity",
        "q_reciprocity",
        "q_sample_stratified",
        "q_window_dup_pairs",
        "q_repetition_signals",
        "q_decontaminate",
        "q_importance_weights",
        "q_rich_club",
        "q_bipartite",
        "q_rollup",
        "q_asof",
        "q_lm_perplexity",
        "q_pii_scrub",
        "q_bpe_merges",
        "q_mixture_weights",
        "q_hop_plot",
        "q_condensation_layers",
        "q_bpe_encode",
        "q_powerlaw_alpha",
        "q_biased_walks",
        "q_kmeans",
        "q_bm25",
        "q_semdedup",
        "q_squares",
        "q_louvain_move",
        "q_pack_chunks",
        "q_sq8_topk",
        "q_pack_bins",
        "q_weighted_sample",
        "q_percentiles",
        "q_pq_topk",
        "q_ivfpq_topk",
        "q_simrank",
        "q_graph_coarsen",
        "q_event_transition_graph",
        "q_louvain_level",
        "q_dedup_sorted_neighborhood",
        "q_graph_snapshot_diff",
        "q_edges_pmi",
        "q_triangles_doulion",
        "q_ppr_montecarlo",
        "q_weighted_walks",
    ):
        if name in reg:
            fn = reg[name]
            timed(name, lambda f=fn: f(spark, SF_DIR).count())

    total = round(sum(queries.values()), 3)
    # Full per-query detail on its OWN line (r4 lesson: the driver
    # captures only the last ~2000 bytes of output, and the ~74-entry
    # queries dict pushed "metric"/"value" out of that window, so the
    # headline line must stay short).  Detail first, short headline LAST.
    print(
        json.dumps(
            {
                "detail": "per_query_walls_sec",
                "queries": queries,
                "run_tputs_edges_per_sec": run_tputs,
                "superstep_walls_s": [round(w, 3) for w in pr.superstep_wall_s],
            }
        )
    )
    headline_queries = {
        k: queries[k]
        for k in (
            "b_pagerank_10_supersteps",
            "b_pagerank_shuffle_5_supersteps",
            "b_connected_components",
            "b_lpa_5_supersteps",
            "b_triangle_counts",
            "g1_extract_edges",
        )
        if k in queries
    }
    print(
        json.dumps(
            {
                "metric": "pagerank_edges_per_sec_per_superstep",
                "value": round(edges_per_sec, 1),
                "unit": "sec",
                "queries": headline_queries,
                "sf": SF_DIR,
                "total_sec": total,
                "n_queries_timed": len(queries),
                "n_edges_b": n_edges_b,
                "supersteps": pr.iterations,
                "iterations_to_1e6": conv.iterations,
                "converged": conv.converged,
                "measured_runs": MEASURED_RUNS,
                # explicit max — do NOT rely on the runs.sort(...) above
                # still being keyed by throughput
                "value_best": round(max(run_tputs), 1),
                "strategy": pr.strategy,
                "cpus": CPUS,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
