"""Shared canonical-undirected-edge normalization (SURVEY.md §2.11).

One definition of "the undirected edge set" for every graph operator —
cc, triangles, k-core all need the same least/greatest + self-loop
filter + distinct, and a semantics change (null handling, type
coercion) must land in exactly one place.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def canonical_undirected(
    edges: DataFrame,
    *,
    greater_first: bool = False,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Distinct undirected edges as canonical (u, v) pairs with
    self-loops dropped.

    Default orientation is u < v (``least`` first); ``greater_first``
    flips it to u > v — connected components' star operations want the
    larger endpoint first so ``min`` aggregation lands on v.
    """
    if greater_first:
        u, v = F.greatest(src, dst), F.least(src, dst)
    else:
        u, v = F.least(src, dst), F.greatest(src, dst)
    return (
        edges.select(u.alias("u"), v.alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
