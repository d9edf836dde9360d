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


def test_running_user_stats_state_carries_across_batches(spark, tmp_path):
    """applyInPandasWithState custom operator (L6): stream the events
    table in 4 micro-batches; the LAST update per user must equal the
    batch groupBy aggregate exactly, and users spanning batches must
    have emitted MULTIPLE updates (proof the explicit state actually
    carried across micro-batches rather than one batch seeing all
    rows)."""
    from sparkgatha.streaming import running_user_stats

    src_dir = os.path.join(str(tmp_path), "src")
    ev = read_table(spark, SF, "events")
    ev.repartition(4).write.mode("overwrite").parquet(src_dir)
    stream = read_event_stream(spark, src_dir, max_files_per_trigger=1)
    q = (
        running_user_stats(stream)
        .writeStream.format("memory")
        .queryName("rstats_sink")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("rstats_sink").collect()
    # n is monotone per user: the max-n row is the final state
    final = {}
    updates_per_user = {}
    for r in got:
        updates_per_user[r["user_id"]] = updates_per_user.get(r["user_id"], 0) + 1
        if r["user_id"] not in final or r["n"] > final[r["user_id"]]["n"]:
            final[r["user_id"]] = r
    want = {
        r["user_id"]: r
        for r in ev.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert set(final) == set(want)
    for uid, w in want.items():
        g = final[uid]
        assert g["n"] == w["n"], (uid, g["n"], w["n"])
        assert abs(g["total"] - w["total"]) < 1e-6
        assert abs(g["mean"] - w["total"] / w["n"]) < 1e-9
    # at least some users were updated in more than one micro-batch
    assert max(updates_per_user.values()) >= 2, updates_per_user


def test_incremental_merge_is_delta_only_and_compacts(spark, tmp_path):
    """ST6 scale contract: merge_batch writes ONLY the new delta (the
    accumulated table is never rewritten per batch), the commit manifest
    is swapped atomically, and compaction folds deltas into a base
    without changing the merged view."""
    from sparkgatha.extract import extract_cooccurrence_edges

    docs = read_table(spark, SF, "documents")
    b = IncrementalGraphBuilder(spark, str(tmp_path / "inc2"), compact_every=100)
    b.merge_batch(docs.filter(F.col("doc_id") < 150))
    d0 = os.path.join(b.edges_dir, "delta_000000")
    files_before = sorted(os.listdir(d0))
    mtimes_before = {f: os.path.getmtime(os.path.join(d0, f)) for f in files_before}

    b.merge_batch(docs.filter((F.col("doc_id") >= 150) & (F.col("doc_id") < 320)))
    b.merge_batch(docs.filter(F.col("doc_id") >= 320))
    # earlier delta untouched by later merges — O(batch) writes only
    assert sorted(os.listdir(d0)) == files_before
    assert {
        f: os.path.getmtime(os.path.join(d0, f)) for f in files_before
    } == mtimes_before
    state = b._state()
    assert state["base"] is None and len(state["deltas"]) == 3

    full = extract_cooccurrence_edges(docs)

    def same(df):
        return (
            df.join(full.withColumnRenamed("weight", "w2"), ["src", "dst"], "full_outer")
            .filter(
                F.col("weight").isNull()
                | F.col("w2").isNull()
                | (F.col("weight") != F.col("w2"))
            )
            .count()
            == 0
        )

    assert same(b.edges())
    b.compact()
    state = b._state()
    assert state["base"] is not None and state["deltas"] == []
    assert same(b.edges())
    # auto-compaction at threshold
    b2 = IncrementalGraphBuilder(spark, str(tmp_path / "inc3"), compact_every=2)
    b2.merge_batch(docs.filter(F.col("doc_id") < 150))
    b2.merge_batch(docs.filter(F.col("doc_id") >= 150))
    state = b2._state()
    assert state["base"] is not None and state["deltas"] == []
    assert same(b2.edges())


def _stream_files(spark, tmp_path, transform, *batches):
    """Drive an N-micro-batch stream (file order pinned via mtime) through
    ``transform`` in APPEND mode; returns the sink table.

    NOTE (empirically verified): the watermark computed from batch N's
    data becomes effective for late-row filtering one batch LATER than
    naively expected, so a late event must arrive >= 2 batches after the
    event that pushed the watermark past it."""
    import shutil

    from sparkgatha.streaming import EVENTS_SCHEMA

    src = str(tmp_path / "wmsrc")
    os.makedirs(src, exist_ok=True)
    for i, rows in enumerate(batches):
        stage = str(tmp_path / f"stage{i}")
        spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage)
        part = [f for f in os.listdir(stage) if f.endswith(".parquet")][0]
        dst = os.path.join(src, f"f{i}.parquet")
        shutil.copy(os.path.join(stage, part), dst)
        os.utime(dst, (1_700_000_000 + i * 1000, 1_700_000_000 + i * 1000))
    stream = read_event_stream(spark, src, max_files_per_trigger=1)
    name = f"wm_sink_{abs(hash(str(tmp_path))) % 10**8}"
    q = (
        transform(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def _ev(eid, ts, uid=1, etype="a", value=1.0):
    from datetime import datetime

    return (eid, datetime.fromisoformat(ts), uid, etype, value, "{}")


def test_tumbling_late_data_dropped_under_moving_watermark(spark, tmp_path):
    """ST4 in true streaming mode: batch 1 advances the watermark past
    the 10:00 window; a later batch's late row for that window is
    DROPPED, and append mode emits the finalized window with the on-time
    count only."""
    batch1 = [_ev(1, "2024-01-01 10:00:30"), _ev(2, "2024-01-01 12:00:00")]
    batch2 = [_ev(3, "2024-01-01 12:10:00")]  # filler: lets the wm land
    batch3 = [_ev(4, "2024-01-01 10:01:00"),  # late: window end < watermark
              _ev(5, "2024-01-01 12:30:00")]
    out = _stream_files(
        spark, tmp_path,
        lambda s: tumbling_counts(s.withWatermark("ts", "30 minutes")),
        batch1, batch2, batch3,
    )
    rows = {(r["win_start"].isoformat(), r["event_type"]): r["n"] for r in out.collect()}
    assert rows.get(("2024-01-01T10:00:00", "a")) == 1  # late event excluded


def test_session_window_stream_mode_with_watermark(spark, tmp_path):
    """ST3 in true streaming mode: a session finalized by the moving
    watermark is emitted with its on-time events only; a late event that
    would have extended it is dropped."""
    batch1 = [
        _ev(1, "2024-01-01 10:00:00", uid=1),
        _ev(2, "2024-01-01 10:02:00", uid=1),
        _ev(3, "2024-01-01 12:00:00", uid=2),  # watermark pusher
    ]
    batch2 = [_ev(4, "2024-01-01 12:10:00", uid=2)]  # filler: wm lands
    batch3 = [
        _ev(5, "2024-01-01 10:03:00", uid=1),  # late: session already closed
        _ev(6, "2024-01-01 12:40:00", uid=2),
    ]
    out = _stream_files(
        spark, tmp_path,
        lambda s: session_counts(s.withWatermark("ts", "30 minutes")),
        batch1, batch2, batch3,
    )
    u1 = [r for r in out.collect() if r["user_id"] == 1]
    assert len(u1) == 1
    assert u1[0]["session_start"].isoformat() == "2024-01-01T10:00:00"
    assert u1[0]["n_events"] == 2  # late event 4 did not extend the session


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


def test_incremental_matches_full_rebuild_with_over_cap_doc(spark, tmp_path):
    """ST6 under a doc over DEFAULT_MAX_TERMS_PER_DOC distinct terms:
    merge_batch must NOT inherit a per-doc term cap (the trim's df is
    batch-local there vs whole-corpus in a rebuild — regression for the
    round-3 advice finding where the two silently diverged)."""
    from sparkgatha.extract import DEFAULT_MAX_TERMS_PER_DOC, extract_cooccurrence_edges

    n = DEFAULT_MAX_TERMS_PER_DOC + 40
    rows = [("m", " ".join(f"w{i:04d}" for i in range(n)))] + [
        (f"c{j}", f"w0000 w0001 y{j}") for j in range(6)
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    b = IncrementalGraphBuilder(spark, str(tmp_path / "inc_cap"))
    b.merge_batch(docs.filter(F.col("doc_id") == "m"))
    b.merge_batch(docs.filter(F.col("doc_id") != "m"))
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
    # the over-cap doc's rare-term pairs all survived (no silent trim)
    assert inc.filter(
        (F.col("src") == f"w{n-2:04d}") & (F.col("dst") == f"w{n-1:04d}")
    ).count() == 1


def test_incremental_warm_rerank_matches_cold(spark, tmp_path):
    """ST6 + G4 warm start: after extending the graph with a new batch,
    reranking seeded by the previous ranks reaches the same fixpoint as
    a cold run on the merged graph, in no more supersteps."""
    from pyspark.sql import functions as F
    from sparkgatha.streaming import IncrementalGraphBuilder

    b = IncrementalGraphBuilder(spark, str(tmp_path / "g"), compact_every=99)
    docs1 = spark.createDataFrame(
        [(i, "join filter window hash scan") for i in range(30)],
        "doc_id long, text string",
    )
    docs2 = spark.createDataFrame(
        [(100 + i, "scan merge sort join probe") for i in range(30)],
        "doc_id long, text string",
    )
    b.merge_batch(docs1)
    r1, _ = b.rerank()
    b.merge_batch(docs2)
    warm, rw = b.rerank(prev=r1)
    cold, rc = b.rerank()
    # init-independence is the contract; iteration-count advantage only
    # holds when the delta batch is small relative to the graph (the
    # same-graph case is asserted in test_resume), not for this
    # structure-doubling batch
    assert rw.converged and rc.converged
    j = warm.alias("w").join(cold.alias("c"), "key")
    mx = j.agg(F.max(F.abs(F.col("w.rank") - F.col("c.rank")))).collect()[0][0]
    assert mx < 1e-7
