"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in the ``sparkgatha`` package; the relational /
dedup / similarity / text-analysis query registry (with its DuckDB
oracle SQL) is ``sparkgatha.relational.REGISTRY``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY.md §7.2): sf0.001 documents → tokenize →
    within-document term-pair co-occurrence edges (Arrow mapInPandas) →
    symmetrize → PageRank (NetworkX semantics, converged) → top-20 terms
    by rank with their keys."""
    from sparkgatha.extract import (
        extract_cooccurrence_edges,
        node_ids,
        symmetrize,
    )
    from sparkgatha.graph.pagerank import pagerank
    from sparkgatha.io import read_table

    docs = read_table(spark, SF0001, "documents")
    edges = extract_cooccurrence_edges(docs, text_col="text")
    nodes, id_edges = node_ids(symmetrize(edges))
    result = pagerank(id_edges, alpha=0.85, tol=1e-8, max_iter=60)
    return (
        result.ranks.join(nodes, result.ranks.vertex == nodes.id)
        .select("key", "rank")
        .orderBy(F.col("rank").desc(), F.col("key"))
        .limit(20)
    )


def _registry():
    # importing these modules populates sparkgatha.relational.REGISTRY
    import sparkgatha.dedup  # noqa: F401
    import sparkgatha.functions  # noqa: F401
    import sparkgatha.pipeline  # noqa: F401
    import sparkgatha.similarity  # noqa: F401
    import sparkgatha.textan  # noqa: F401
    from sparkgatha.relational import REGISTRY

    return REGISTRY


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in _registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return {
        name: spec.oracle
        for name, spec in _registry().items()
        if spec.oracle is not None
    }
