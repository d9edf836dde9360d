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


def running_user_stats(events: DataFrame) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``
    (the arbitrary-state API for semantics the built-in windowed aggs
    can't express): per-user running (n, total, mean) maintained in
    explicit group state across micro-batches, one updated row emitted
    per user per batch.

    Scale shape: state is per-key constant-size (two numbers), the
    operator shuffles each batch once on user_id (same key layout every
    batch, so state locality holds), and each Python call sees Arrow
    batches of one key's rows.  Batch-mode equivalent for L6 testing:
    ``groupBy(user_id).agg(count, sum)`` — the stream's LAST update per
    user must equal it bit-for-bit.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdfs, state):
        (user_id,) = key
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n": [n],
                "total": [total],
                "mean": [total / n if n else 0.0],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        "user_id long, n long, total double, mean double",
        "n long, total double",
        "update",
        GroupStateTimeout.NoTimeout,
    )


class IncrementalGraphBuilder:
    """ST6 — foreachBatch incremental co-occurrence graph (SURVEY.md
    §2.9 ST6): each micro-batch of documents appends new edges as a
    DELTA, and the merged view is reconstructed lazily — the
    reference's "extend the graph with the new MEDLINE release" flow
    without a full rebuild.

    Storage layout (the sandbox stand-in for Iceberg MERGE, manifest
    emulating the snapshot pointer — SURVEY.md §4.4)::

        work_dir/edges/base_v<N>/      compacted parquet (optional)
        work_dir/edges/delta_<K>/      one parquet dir per micro-batch
        work_dir/edges/_COMMIT.json    written LAST via os.replace —
                                       the atomic commit: lists the
                                       live base + deltas

    Per-batch work is O(batch): ``merge_batch`` writes ONLY the new
    delta and swaps the commit manifest — it never reads or rewrites
    the accumulated table (the round-1 design rewrote the whole edge
    table per batch and swapped it with a crash-unsafe rmtree+rename).
    ``edges()`` unions the live base + deltas and groupBy-sums weights
    lazily.  When the delta count reaches ``compact_every`` the merged
    table is compacted into a new base dir; the manifest swap commits
    it, and superseded dirs are removed only AFTER the swap (a crash
    mid-compaction leaves garbage dirs, never a corrupt view).
    """

    EDGE_SCHEMA = "src string, dst string, weight double"

    def __init__(
        self,
        spark: SparkSession,
        work_dir: str,
        compact_every: int = 8,
        max_terms_per_doc: int | None = None,
    ):
        """``max_terms_per_doc`` is the per-doc quadratic-fanout guard,
        OFF by default: the trim keeps the lowest-df terms and df here
        is computed over ONE micro-batch, not the whole corpus, so any
        cap makes the incremental graph diverge from a full rebuild for
        docs over the cap (the exact ST6 property test_streaming pins).
        Opt in only when bounding a hostile stream matters more than
        rebuild equivalence — or cap the docs upstream of the stream,
        which keeps both."""
        self.spark = spark
        self.work_dir = work_dir
        self.edges_dir = os.path.join(work_dir, "edges")
        self.compact_every = compact_every
        self.max_terms_per_doc = max_terms_per_doc
        os.makedirs(self.edges_dir, exist_ok=True)

    # -- commit manifest ---------------------------------------------------
    @property
    def _commit_path(self) -> str:
        return os.path.join(self.edges_dir, "_COMMIT.json")

    def _state(self) -> dict:
        if not os.path.exists(self._commit_path):
            return {"base": None, "deltas": [], "next_id": 0}
        import json

        with open(self._commit_path) as f:
            return json.load(f)

    def _commit(self, state: dict) -> None:
        """Manifest-last atomic commit (same pattern as graph/checkpoint)."""
        import json

        tmp = self._commit_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f, indent=2, sort_keys=True)
        os.replace(tmp, self._commit_path)

    # -- read side ----------------------------------------------------------
    def edges(self) -> DataFrame:
        state = self._state()
        parts = ([state["base"]] if state["base"] else []) + state["deltas"]
        if not parts:
            return self.spark.createDataFrame([], self.EDGE_SCHEMA)
        df = self.spark.read.parquet(
            *[os.path.join(self.edges_dir, p) for p in parts]
        )
        if len(parts) == 1:
            return df
        return df.groupBy("src", "dst").agg(F.sum("weight").alias("weight"))

    # -- write side ---------------------------------------------------------
    def merge_batch(self, batch_docs: DataFrame) -> None:
        """Append a document micro-batch as a delta (O(batch) work)."""
        from sparkgatha.extract import extract_cooccurrence_edges

        state = self._state()
        delta = f"delta_{state['next_id']:06d}"
        # default: no per-doc term cap (see __init__ — a batch-local-df
        # trim silently breaks incremental == full-rebuild for over-cap
        # docs); callers that accept that trade opt in at construction
        extract_cooccurrence_edges(
            batch_docs, text_col="text",
            max_terms_per_doc=self.max_terms_per_doc,
        ).write.mode("overwrite").parquet(os.path.join(self.edges_dir, delta))
        state["deltas"].append(delta)
        state["next_id"] += 1
        self._commit(state)
        if len(state["deltas"]) >= self.compact_every:
            self.compact()

    def compact(self) -> None:
        """Fold base + deltas into a fresh base dir; commit, then clean."""
        import shutil

        state = self._state()
        old_dirs = ([state["base"]] if state["base"] else []) + state["deltas"]
        if not old_dirs:
            return
        new_base = f"base_v{state['next_id']:06d}"
        self.edges().write.mode("overwrite").parquet(
            os.path.join(self.edges_dir, new_base)
        )
        self._commit(
            {"base": new_base, "deltas": [], "next_id": state["next_id"] + 1}
        )
        for d in old_dirs:  # post-commit cleanup; crash here leaves garbage only
            shutil.rmtree(os.path.join(self.edges_dir, d), ignore_errors=True)

    def foreach_batch(self, batch_docs: DataFrame, batch_id: int) -> None:
        self.merge_batch(batch_docs)

    def rerank(self, prev=None, tol: float = 1e-8, max_iter: int = 60):
        """Warm-started PageRank over the current merged graph: pass the
        previous result's ``(key, rank)`` to seed the next run — the
        fixpoint is init-independent (tests), a warm start just converges
        in fewer supersteps after a small delta merge.

        Returns (ranks_by_key, PageRankResult): ranks joined back to the
        string node keys so successive calls can be chained directly.
        """
        from sparkgatha.extract import node_ids, symmetrize
        from sparkgatha.graph.pagerank import pagerank

        nodes, id_edges = node_ids(symmetrize(self.edges()))
        init = None
        if prev is not None:
            init = prev.join(nodes, "key").select(
                F.col("id").alias("vertex"), "rank"
            )
        r = pagerank(id_edges, tol=tol, max_iter=max_iter, init_ranks=init)
        keyed = r.ranks.join(nodes, r.ranks.vertex == nodes.id).select(
            "key", "rank"
        )
        return keyed, r
