"""Entry point 1 — graph construction pipeline (SURVEY.md §3.1).

Reference analog: ``python -m agatha.construct`` — config → Dask cluster
attach → phase DAG (download → parse → analyze → embed → kNN → bipartite
edges → hash ids → adjacency export), each phase ending in a named
checkpoint (agatha/construct/__main__.py, dask_checkpoint.py — per
SURVEY.md §3.1).

The Spark-native pipeline is a declarative plan over the same phases:

    corpus scan (S1) → tokenize/extract (G1, Arrow mapInPandas)
    → weight + frequency cutoff (A1/A2 + the reference's skew lever)
    → node ids (G2, xxhash64 + collision assert)
    → adjacency layout (G11) → serving export (S5) + manifest (S4)

Each phase writes a checkpoint directory with a manifest; finished
phases are skipped on re-run — the reference's checkpoint-skip behavior
(dask_checkpoint.py) preserved exactly, but with columnar parquet and
snapshot manifests instead of pickled bags.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F

from sparkgatha.extract import (
    DEFAULT_MAX_TERMS_PER_DOC,
    DEFAULT_STOPWORDS,
    assert_no_id_collisions,
    extract_cooccurrence_edges,
    node_ids_safe,
    symmetrize,
)
from sparkgatha.graph.metrics import state_fingerprint
from sparkgatha.io import CorpusIO, read_manifest, write_adjacency, write_manifest


@dataclass
class ConstructConfig:
    """Plain-dataclass replacement for the reference's protobuf
    ConstructConfig (SURVEY.md §1.3)."""

    corpus_path: str
    out_dir: str
    text_col: str = "content"
    fmt: str = "parquet"               # 'iceberg' in production
    stopwords: tuple[str, ...] = DEFAULT_STOPWORDS
    min_weight: float = 0.0
    max_df: float | None = None        # the reference's frequency cutoff
    # per-doc distinct-term cap (quadratic-fanout guard): ON by default
    # here — construct is the entry point that faces raw, untrusted
    # corpora; extract_cooccurrence_edges itself defaults to None so
    # corpus-slice callers (streaming deltas, oracle-checked queries)
    # never inherit a corpus-relative trim silently
    max_terms_per_doc: int | None = DEFAULT_MAX_TERMS_PER_DOC
    weight_mode: str = "count"         # 'idf' = TF-IDF-flavored (G1)
    num_partitions: int = 32
    phases: tuple[str, ...] = ("edges", "nodes", "adjacency")
    force: bool = False                # ignore existing checkpoints
    # G8 similarity phase (AGATHA's sentence-kNN edges): when an
    # embeddings table (vec_id, embedding) is given, ann_topk adds
    # kNN similarity edges between '<sim_node_prefix><vec_id>' nodes —
    # the heterogeneous-graph analog of the reference's FAISS edges.
    embeddings_path: str | None = None
    knn_k: int = 5
    sim_node_prefix: str = "v:"
    # typed-node multigraph (the reference prefixes every node with its
    # kind — s:/l:/e:/m: in agatha/util/entity_types.py; here t: terms
    # and v: sim nodes): term keys become 't:<term>' in the built graph.
    # query.py's term lookup maps raw user terms to typed keys with a
    # legacy fallback, so pre-round-4 graphs keep working.
    typed_nodes: bool = True


@dataclass
class ConstructResult:
    edges_path: str
    nodes_path: str
    adjacency_path: str
    n_edges: int = 0
    n_nodes: int = 0
    n_sim_edges: int = 0
    skipped: list[str] = field(default_factory=list)


def _phase_done(path: str) -> bool:
    return read_manifest(os.path.join(path, "_MANIFEST.json")) is not None


def _finish_phase(df_path: str, df: DataFrame, phase: str) -> int:
    n = df.count()
    write_manifest(
        os.path.join(df_path, "_MANIFEST.json"),
        {
            "phase": phase,
            "rows": n,
            "schema": df.schema.jsonValue(),
            "lineage_sha": state_fingerprint(df),
        },
    )
    return n


def build_graph(spark: SparkSession, cfg: ConstructConfig) -> ConstructResult:
    """Run the construction pipeline with per-phase checkpoint-skip."""
    os.makedirs(cfg.out_dir, exist_ok=True)
    edges_path = os.path.join(cfg.out_dir, "edges")
    nodes_path = os.path.join(cfg.out_dir, "nodes")
    adj_path = os.path.join(cfg.out_dir, "adjacency")
    result = ConstructResult(edges_path, nodes_path, adj_path)

    corpus = CorpusIO(cfg.fmt).read(spark, cfg.corpus_path)

    # phase 1: term co-occurrence edges (string keyed, canonical src<dst)
    if cfg.force or not _phase_done(edges_path):
        edges = extract_cooccurrence_edges(
            corpus,
            text_col=cfg.text_col,
            stopwords=cfg.stopwords,
            min_weight=cfg.min_weight,
            max_df=cfg.max_df,
            num_partitions=cfg.num_partitions,
            weight_mode=cfg.weight_mode,
            max_terms_per_doc=cfg.max_terms_per_doc,
        )
        if cfg.typed_nodes:
            # typed multigraph keys (reference entity_types analog): a
            # free concat projection — no shuffle, no extra pass
            from sparkgatha.entity_types import TERM_TYPE, typed_key_col

            edges = edges.select(
                typed_key_col(TERM_TYPE, "src").alias("src"),
                typed_key_col(TERM_TYPE, "dst").alias("dst"),
                "weight",
            )
        edges.write.mode("overwrite").parquet(edges_path)
        result.n_edges = _finish_phase(edges_path, spark.read.parquet(edges_path), "edges")
    else:
        result.skipped.append("edges")
        result.n_edges = read_manifest(os.path.join(edges_path, "_MANIFEST.json"))["rows"]
    edges = spark.read.parquet(edges_path)

    # phase 1b (optional): G8 kNN similarity edges over embeddings —
    # the reference adds FAISS sentence-kNN edges to the same multigraph
    # (agatha/construct/knn_util.py per SURVEY.md §2.11 G8); here the
    # bucketed multi-table hyperplane LSH (similarity.ann_topk) supplies
    # the candidate-bounded equivalent, merged as string-keyed edges so
    # the graph stays heterogeneous exactly like the reference's.
    if cfg.embeddings_path is not None:
        sim_path = os.path.join(cfg.out_dir, "sim_edges")
        if cfg.force or not _phase_done(sim_path):
            from sparkgatha.similarity import ann_topk

            emb = spark.read.parquet(cfg.embeddings_path)
            dim = len(emb.select("embedding").first()["embedding"])
            knn = ann_topk(emb, k=cfg.knn_k, dim=dim).filter(F.col("cos") > 0)
            sim_edges = knn.select(
                F.concat(F.lit(cfg.sim_node_prefix), F.col("qid")).alias("src"),
                F.concat(F.lit(cfg.sim_node_prefix), F.col("nid")).alias("dst"),
                F.col("cos").alias("weight"),
            )
            sim_edges.write.mode("overwrite").parquet(sim_path)
            result.n_sim_edges = _finish_phase(
                sim_path, spark.read.parquet(sim_path), "similarity"
            )
        else:
            result.skipped.append("similarity")
            result.n_sim_edges = read_manifest(
                os.path.join(sim_path, "_MANIFEST.json")
            )["rows"]
        edges = edges.unionByName(spark.read.parquet(sim_path))

    # phase 2: node dictionary + id-space edges (collision-HANDLED: at
    # 10^12-key cardinality xxhash64 collisions are a certainty, so the
    # dictionary deterministically re-salts colliding keys instead of
    # dying; the assert is the post-condition, not the strategy)
    if cfg.force or not _phase_done(nodes_path):
        nodes, _ = node_ids_safe(edges)
        assert_no_id_collisions(nodes)
        nodes.write.mode("overwrite").parquet(nodes_path)
        result.n_nodes = _finish_phase(nodes_path, spark.read.parquet(nodes_path), "nodes")
    else:
        result.skipped.append("nodes")
        result.n_nodes = read_manifest(os.path.join(nodes_path, "_MANIFEST.json"))["rows"]
    nodes = spark.read.parquet(nodes_path)

    # phase 3: symmetrized id-space adjacency, range-partitioned + sorted
    # (the Spark-idiomatic replacement for the SQLite serving store, S5)
    if cfg.force or not _phase_done(adj_path):
        id_edges = (
            symmetrize(edges)
            .join(nodes.select(F.col("key").alias("src"), F.col("id").alias("src_id")), "src")
            .join(nodes.select(F.col("key").alias("dst"), F.col("id").alias("dst_id")), "dst")
            .select(
                F.col("src_id").alias("src"),
                F.col("dst_id").alias("dst"),
                "weight",
            )
        )
        write_adjacency(id_edges, adj_path, cfg.num_partitions)
        _finish_phase(adj_path, spark.read.parquet(adj_path), "adjacency")
    else:
        result.skipped.append("adjacency")

    return result


def load_adjacency(spark: SparkSession, out_dir: str) -> tuple[DataFrame, DataFrame]:
    """(nodes, id_edges) from a finished build — the query-side loader
    (the reference's sqlite3_lookup open, SURVEY.md §3.2)."""
    nodes = spark.read.parquet(os.path.join(out_dir, "nodes"))
    edges = spark.read.parquet(os.path.join(out_dir, "adjacency"))
    return nodes, edges
