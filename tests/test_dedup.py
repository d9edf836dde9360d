"""Dedup-suite tests beyond the driver's oracle rows: LSH recall of the
composed near-dup pipeline against exhaustive exact Jaccard, bucket-cap
behavior, and keep-min canonical semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkgatha.dedup import (
    DEFAULT_BUCKET_CAP,
    lsh_bands,
    lsh_candidates,
    near_duplicates,
    verified_near_dup_pairs,
)
from sparkgatha.relational import REGISTRY

SF001 = "/root/testdata/sf0.01"


def _docs(spark):
    return spark.read.parquet(f"{SF001}/documents.parquet")


def test_near_dup_pairs_subset_of_exact(spark):
    """Every verified pair IS an exact >=0.8 Jaccard pair (precision 1.0
    by construction — the verify stage recomputes exact Jaccard), and
    LSH recall vs the exhaustive all-pairs query is high."""
    docs = _docs(spark)
    got = {
        (r["doc_a"], r["doc_b"])
        for r in verified_near_dup_pairs(docs).collect()
    }
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in REGISTRY["q_dedup_ngram_jaccard"].fn(spark, SF001).collect()
    }
    assert got <= exact                       # precision 1.0
    assert exact, "fixture must contain near-dup pairs"
    recall = len(got & exact) / len(exact)
    # 4 bands x 4 rows: P(candidate) = 1-(1-j^4)^4 = 0.93 at j=0.8
    assert recall >= 0.6, recall


def test_near_duplicates_keep_min(spark):
    docs = _docs(spark)
    pairs = verified_near_dup_pairs(docs).collect()
    nd = {r["dup_doc_id"]: r["keep_doc_id"] for r in near_duplicates(docs).collect()}
    # one mapping per distinct dup; keep = min verified partner
    expect: dict[int, int] = {}
    for r in pairs:
        expect[r["doc_b"]] = min(expect.get(r["doc_b"], r["doc_a"]), r["doc_a"])
    assert nd == expect
    assert all(k < d for d, k in nd.items())


def test_bucket_cap_star_routing(spark):
    """Over-cap buckets are NOT dropped: members route to a star on the
    bucket min (O(size) pairs), so a >cap cluster of near-identical docs
    still collapses through verify + keep-min instead of silently
    surviving (r02 ADVICE)."""
    docs = _docs(spark)
    # star pairs are a subset of what full pairwise would generate
    default = {(r["doc_a"], r["doc_b"]) for r in lsh_candidates(docs).collect()}
    starred = {
        (r["doc_a"], r["doc_b"])
        for r in lsh_candidates(docs, bucket_cap=1).collect()
    }
    assert starred and starred <= default
    assert all(a < b for a, b in starred)
    # synthetic over-cap cluster: 8 identical texts, cap=3 → every band
    # bucket overflows → star candidates (0, i) → all 7 dups map to 0
    text = "the quick brown fox jumps over the lazy dog " * 3
    tiny = spark.createDataFrame(
        [(i, text) for i in range(8)], "doc_id long, text string"
    )
    nd = near_duplicates(tiny, threshold=0.8, bucket_cap=3)
    assert {r["dup_doc_id"]: r["keep_doc_id"] for r in nd.collect()} == {
        i: 0 for i in range(1, 8)
    }
    # fixture buckets all fit under the default cap (scale guard only)
    sizes = (
        lsh_bands(docs).groupBy("band", "sig").agg(F.count("*").alias("k"))
    )
    assert sizes.agg(F.max("k")).collect()[0][0] <= DEFAULT_BUCKET_CAP


def test_all_pairs_guard_trips_and_passes(spark, monkeypatch):
    """The standalone all-pairs verification ops (ngram-Jaccard,
    embed-cosine) refuse inputs above the configurable bound — a 100 TB
    caller can't launch a quadratic job by accident — and run normally
    at oracle scale."""
    import pytest

    from sparkgatha.relational import REGISTRY
    from sparkgatha.util import guard_input_rows

    SF = "/root/testdata/sf0.001"
    # direct helper: trips at a tiny explicit bound, short-circuiting
    docs = spark.range(50).select(F.col("id").alias("doc_id"))
    with pytest.raises(ValueError, match="quadratic"):
        guard_input_rows(docs, "op_under_test", max_rows=10)
    assert guard_input_rows(docs, "op_under_test", max_rows=50) is docs
    # env-var bound reaches the registered ops
    monkeypatch.setenv("SPARKGATHA_ALL_PAIRS_MAX_ROWS", "10")
    for name in ("q_dedup_ngram_jaccard", "q_dedup_embed_cosine"):
        with pytest.raises(ValueError, match=name):
            REGISTRY[name].fn(spark, SF).limit(1).count()
    # at the default bound the fixture-scale ops still run
    monkeypatch.delenv("SPARKGATHA_ALL_PAIRS_MAX_ROWS")
    assert REGISTRY["q_dedup_embed_cosine"].fn(spark, SF).count() >= 0


def test_decontaminate_removes_window_sharers(spark):
    """A corpus doc sharing one exact 8-token run with an eval doc is
    removed; docs with only shorter overlaps survive; the eval set
    itself is never part of the output."""
    from sparkgatha.dedup import decontaminate

    run = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    corpus = spark.createDataFrame(
        [
            (1, f"intro text {run} and a completely different tail"),
            (2, "no overlap here at all just original writing stays"),
            (3, "alpha beta gamma delta only four shared tokens here"),
        ],
        ["doc_id", "text"],
    )
    eval_docs = spark.createDataFrame(
        [(100, f"the benchmark question contains {run} verbatim")],
        ["doc_id", "text"],
    )
    kept = sorted(
        r.doc_id
        for r in decontaminate(corpus, eval_docs, k=8).select("doc_id").collect()
    )
    assert kept == [2, 3]
    # shuffle-join path is semantics-identical to the broadcast path
    kept_sj = sorted(
        r.doc_id
        for r in decontaminate(corpus, eval_docs, k=8, broadcast_eval=False)
        .select("doc_id")
        .collect()
    )
    assert kept_sj == kept


def test_decontaminate_short_docs_and_bad_k(spark):
    """Documents shorter than k emit no windows (never flagged, never
    crash); k < 2 raises."""
    import pytest

    from sparkgatha.dedup import decontaminate, window_hashes

    corpus = spark.createDataFrame(
        [(1, "tiny doc"), (2, "three tokens only")], ["doc_id", "text"]
    )
    eval_docs = spark.createDataFrame([(9, "tiny doc")], ["doc_id", "text"])
    assert window_hashes(corpus, k=8).count() == 0
    kept = sorted(
        r.doc_id
        for r in decontaminate(corpus, eval_docs, k=8).select("doc_id").collect()
    )
    assert kept == [1, 2]
    with pytest.raises(ValueError):
        window_hashes(corpus, k=1)


def test_sorted_neighborhood_finds_planted_neighbors(spark):
    """SNM: near-identical docs sharing a key prefix pair up; the same
    pair placed outside each other's rank window is (by design) missed —
    the blocking-key tradeoff the method documents.  The ranking plan
    must not funnel through a single partition."""
    from sparkgatha.dedup import sorted_neighborhood_pairs

    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [(1, base), (2, base + " iota")]
    # filler whose keys sort BETWEEN the pair when window is tiny
    rows += [(100 + i, f"alpha b{chr(97 + i)} filler text distinct "
              f"words {i}") for i in range(12)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in sorted_neighborhood_pairs(
            docs, window=12, threshold=0.5, num_partitions=4
        ).collect()
    }
    assert (1, 2) in got and got[(1, 2)] >= 0.5
    # re-key doc 2 to 'alpha bz ...': the fillers ('alpha ba'..'alpha
    # bl') now sort between doc 1 ('alpha beta...') and doc 2, so a
    # window of 1 cannot reach across them — the documented
    # blocking-key miss mode
    missed = sorted_neighborhood_pairs(
        docs.withColumn(
            "text",
            F.when(F.col("doc_id") == 2, F.concat(F.lit("alpha bz "),
                                                  F.col("text")))
            .otherwise(F.col("text")),
        ),
        window=1, threshold=0.5, num_partitions=4,
    ).collect()
    assert all((r["doc_a"], r["doc_b"]) != (1, 2) for r in missed)
    # plan hygiene: exact global rank without a single-partition funnel
    plan = sorted_neighborhood_pairs(
        docs, window=2, threshold=0.5, num_partitions=4
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan
