"""G6 — synchronous label propagation with deterministic min-label
tie-break (SURVEY.md §2.11 G6, §7.4.1).

Exact-match bar (BASELINE.json): community labels must match exactly at
convergence, so every source of nondeterminism is pinned:

  * synchronous updates (all vertices update from the previous state);
  * a vertex adopts the neighbor label with the greatest total incident
    edge weight; ties break to the SMALLEST label (A7 mode-agg with
    deterministic tie-break);
  * a vertex with no neighbors keeps its label;
  * convergence = zero label changes (or max_iter).

NetworkX's own asynchronous LPA is order-sensitive, so the golden is a
pure-Python implementation of this exact rule in the test suite
(tests/test_graph_golden.py), per SURVEY.md §7.4.1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from sparkgatha.util import no_aqe


def label_propagation(
    edges: DataFrame, max_iter: int = 20
) -> DataFrame:
    """(vertex long, label long) over symmetrized ``edges(src,dst,weight)``.

    Pass both orientations (extract.symmetrize) for undirected graphs:
    messages flow src → dst only.
    """
    vertices = (
        edges.select(F.col("src").alias("vertex"))
        .unionByName(edges.select(F.col("dst").alias("vertex")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = vertices.select("vertex", F.col("vertex").alias("label"))
    labels = labels.localCheckpoint(eager=True)

    pick = Window.partitionBy("dst").orderBy(
        F.col("wsum").desc(), F.col("label").asc()
    )
    aqe = no_aqe(edges.sparkSession)
    aqe.__enter__()
    for _ in range(max_iter):
        # gather: total incident weight per (vertex, neighbor label)
        votes = (
            edges.join(labels, edges.src == labels.vertex)
            .groupBy("dst", "label")
            .agg(F.sum("weight").alias("wsum"))
        )
        best = (
            votes.withColumn("rn", F.row_number().over(pick))
            .filter(F.col("rn") == 1)
            .select(F.col("dst").alias("vertex"), F.col("label").alias("new_label"))
        )
        new_labels = (
            labels.join(best, "vertex", "left")
            .select(
                "vertex",
                F.coalesce("new_label", "label").alias("label"),
                (F.coalesce("new_label", "label") != F.col("label")).alias(
                    "_changed"
                ),
            )
        )
        new_labels = new_labels.localCheckpoint(eager=False)
        changed = new_labels.filter(F.col("_changed")).count()
        labels = new_labels.select("vertex", "label")
        if changed == 0:
            break
    aqe.__exit__(None, None, None)
    return labels
