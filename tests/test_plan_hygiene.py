"""Automated physical-plan hygiene sweep over the driver's 50-query
priority window (SURVEY.md §4.3): every graded plan must be free of the
three 100 TB killers —

* CartesianProduct / BroadcastNestedLoopJoin, except in the explicitly
  guarded kNN queries (J10/G8, documented all-pairs-at-oracle-scale);
* unpartitioned Window (single-partition funnel) — every
  windowspecdefinition must name a partition key;
* BatchEvalPython (row-at-a-time Python UDF) — Python stages must be
  Arrow-batched (ArrowEvalPython / mapInPandas / FlatMapGroupsInPandas)
  or a Spark-4 UDTF plan node.

Building plans (not executing) keeps the sweep fast; it catches physical
regressions the value-checks cannot see.

KNOWN LIMIT — checkpoint hiding: a query that localCheckpoints (or
collects a bounded scalar) while BUILDING its frame truncates the
inspectable plan at the checkpoint: the sweep sees a LogicalRDD scan,
not the upstream stages.  This is inherent to every iterative graph
query (their supersteps are checkpoint-hidden by design) and to the
two-lineage text queries (q_lm_perplexity's scored barrier,
q_bpe_merges' per-round rewrites).  The compensating control is
per-operator plan assertions on the PRE-checkpoint library frames —
see test_textan.py::test_lm_perplexity_plan_shape and the plan asserts
in test_linkgraph_ops / test_skew — so a banned node upstream of a
checkpoint still fails a test, just not this sweep.
"""

import re

import pytest

SF = "/root/testdata/sf0.001"

# queries whose SEMANTICS are all-pairs at oracle scale, documented as
# such in their docstrings (guarded cartesian J10; exact-kNN baseline G8;
# embedding-cosine dedup oracle form)
CARTESIAN_OK = {
    "q_crossjoin_knn",
    "q_knn_topk_per_vec",
    # sq8's COARSE stage scans all candidates per query BY DESIGN (the
    # same all-pairs semantics as the exact-kNN baseline) — its point
    # is that the scan streams 1-byte-per-dim codes instead of full
    # doubles (~8x less traffic), not that it prunes candidates; the
    # exact rerank above it touches only coarse_c rows per query
    "q_sq8_topk",
}

# window specs keyed by constant-foldable literals (e.g. lit(0) grouping
# for a global top-k over an already-aggregated tiny relation)
_PARTITION_KEY_RE = re.compile(r"windowspecdefinition\(([^)]*)\)")


# replica-tier keys added after the round-5 window froze, swept with the
# same discipline as the graded 50 (their final post-checkpoint plans)
_EXTRA_SWEPT = ("q_triangles_doulion", "q_ppr_montecarlo", "q_weighted_walks")


def _window_entries():
    import __spark_entry__ as m

    qs = m.queries()
    return list(qs.items())[:50] + [(n, qs[n]) for n in _EXTRA_SWEPT]


@pytest.mark.parametrize(
    "name,fn", _window_entries(), ids=[n for n, _ in _window_entries()]
)
def test_plan_hygiene(spark, name, fn):
    if name == "q_stateful_user_stats":
        # calling this fn EXECUTES a 4-micro-batch stream and returns a
        # projection over the memory sink — asserting on that trivial
        # plan would be illusory coverage.  Inspect the STREAMING plan
        # the entry exists for instead: the stateful operator must be
        # the Arrow-batched with-state node grouped on user_id (a
        # streaming plan cannot be built into an executedPlan without
        # writeStream.start(), so the analyzed logical plan is the
        # inspectable surface).
        from sparkgatha.streaming import read_event_stream, running_user_stats

        stream = running_user_stats(
            read_event_stream(spark, f"{SF}/events.parquet")
        )
        logical = stream._jdf.queryExecution().analyzed().toString()
        # (no BatchEvalPython assertion here: that is a PHYSICAL node
        # that can never appear in a logical plan — the with-state node
        # check below is the real Arrow-batched guarantee)
        assert "FlatMapGroupsInPandasWithState" in logical, logical[:400]
        assert "user_id" in logical
        return
    plan = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()

    if name not in CARTESIAN_OK:
        assert "CartesianProduct" not in plan, f"{name}: cartesian product"
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name}: nested-loop join"
        )

    for spec in _PARTITION_KEY_RE.findall(plan):
        # windowspecdefinition(part1#id, ..., order ASC ..., frame$())
        # an unpartitioned spec starts directly with the order spec
        head = spec.split(",")[0].strip()
        assert not head.endswith(("ASC NULLS FIRST", "DESC NULLS LAST",
                                  "ASC NULLS LAST", "DESC NULLS FIRST")), (
            f"{name}: unpartitioned Window: {spec[:120]}"
        )

    # BatchEvalPythonUDTF is the Spark-4 batched UDTF node (F6, allowed);
    # bare BatchEvalPython is the row-at-a-time scalar UDF node (banned)
    assert not re.search(r"BatchEvalPython(?!UDTF)", plan), (
        f"{name}: row-at-a-time Python UDF (want Arrow-batched)"
    )
