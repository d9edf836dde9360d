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


def test_bucket_cap_drops_degenerate_buckets(spark):
    """With cap=1 every bucket is dropped, so no candidates survive;
    with the default cap the fixture's buckets all fit (the cap is a
    scale guard, not a semantics change at fixture size)."""
    docs = _docs(spark)
    assert lsh_candidates(docs, bucket_cap=1).count() == 0
    sizes = (
        lsh_bands(docs).groupBy("band", "sig").agg(F.count("*").alias("k"))
    )
    assert sizes.agg(F.max("k")).collect()[0][0] <= DEFAULT_BUCKET_CAP
