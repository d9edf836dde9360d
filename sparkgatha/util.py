"""Shared engine utilities."""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import SparkSession


@contextmanager
def no_aqe(spark: SparkSession):
    """Disable adaptive query execution for the duration of an iterative
    superstep loop.

    Measured on this engine (see BENCH notes): with AQE on, each
    superstep's fixed, tiny-stats plan is re-planned stage-by-stage into
    serial mini-jobs — 14-30s/superstep vs 0.9s with AQE off at 32
    shuffle partitions.  AQE's wins (skew splits, coalescing) apply to
    one-shot scans with unknown stats, not to a pinned join+agg loop
    whose partitioning we control explicitly (SURVEY.md §4.3.3), so the
    engine scopes AQE off inside G4–G6/G9 loops and leaves it on for the
    relational surface.
    """
    prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
