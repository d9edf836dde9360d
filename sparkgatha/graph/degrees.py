"""G3 — degree tables (SURVEY.md §2.11 G3).

Reference analog: AGATHA's Dask foldby degree/frequency counts in
agatha/construct/graph_util.py (SURVEY.md §2.4 A1).  Pure groupBy+agg —
Catalyst's partial+final aggregation gives map-side combine for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def out_degrees(edges: DataFrame) -> DataFrame:
    return edges.groupBy(F.col("src").alias("vertex")).agg(
        F.count("*").alias("out_degree"),
        F.sum("weight").alias("out_weight"),
    )


def in_degrees(edges: DataFrame) -> DataFrame:
    return edges.groupBy(F.col("dst").alias("vertex")).agg(
        F.count("*").alias("in_degree"),
        F.sum("weight").alias("in_weight"),
    )


def degrees(edges: DataFrame) -> DataFrame:
    """Total (in+out) degree per vertex for directed edge tables; for a
    symmetrized undirected table, out_degrees alone is the degree."""
    o = out_degrees(edges)
    i = in_degrees(edges)
    return (
        o.join(i, "vertex", "full_outer")
        .select(
            "vertex",
            (
                F.coalesce("out_degree", F.lit(0))
                + F.coalesce("in_degree", F.lit(0))
            ).alias("degree"),
            (
                F.coalesce("out_weight", F.lit(0.0))
                + F.coalesce("in_weight", F.lit(0.0))
            ).alias("weighted_degree"),
        )
    )
