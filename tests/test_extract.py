"""G1/G2 extraction + M1 corpus tests (L3 determinism, L4 sha invariant)."""

import pytest
from pyspark.sql import functions as F

from sparkgatha.corpus import generate_corpus, sha_manifest, verify_sha256
from sparkgatha.extract import (
    assert_no_id_collisions,
    extract_cooccurrence_edges,
    node_ids,
    symmetrize,
)
from sparkgatha.io import read_table

SF = "/root/testdata/sf0.001"


def test_extraction_matches_selfjoin_oracle(spark):
    """The mapInPandas pair-expander must produce exactly the edges the
    declarative self-join form produces (q_selfjoin_cooc semantics)."""
    docs = read_table(spark, SF, "documents")
    fast = extract_cooccurrence_edges(docs)
    from sparkgatha.relational import REGISTRY
    slow = REGISTRY["q_selfjoin_cooc"].fn(spark, SF).withColumnRenamed(
        "weight", "w2"
    )
    joined = fast.join(slow, ["src", "dst"], "full_outer")
    bad = joined.filter(
        F.col("weight").isNull()
        | F.col("w2").isNull()
        | (F.col("weight") != F.col("w2"))
    ).count()
    assert bad == 0


def test_extraction_deterministic_across_partitionings(spark):
    docs = read_table(spark, SF, "documents")
    e2 = extract_cooccurrence_edges(docs.repartition(2)).collect()
    e16 = extract_cooccurrence_edges(docs.repartition(16)).collect()
    assert sorted(map(tuple, e2)) == sorted(map(tuple, e16))


def test_max_df_drops_hub_terms(spark):
    docs = read_table(spark, SF, "documents")
    full = extract_cooccurrence_edges(docs)
    cut = extract_cooccurrence_edges(docs, max_df=0.8)
    n_cut = cut.count()
    assert 0 < n_cut < full.count()  # drops hubs but keeps real edges
    # surviving terms all have df <= 0.5 * n_docs
    from sparkgatha.extract import tokenize
    n_docs = docs.count()
    df_counts = (
        tokenize(docs).select(F.explode("terms").alias("t"))
        .groupBy("t").count()
    )
    hot = {r["t"] for r in df_counts.filter(F.col("count") > 0.8 * n_docs).collect()}
    terms_used = {r["src"] for r in cut.select("src").distinct().collect()} | {
        r["dst"] for r in cut.select("dst").distinct().collect()
    }
    assert not (hot & terms_used)


def test_per_doc_term_cap_bounds_fanout(spark):
    """A pathological doc (many distinct terms) must emit at most
    cap*(cap-1)/2 pairs, keeping its lowest-df terms; docs below the cap
    are untouched (goldens identical with/without the cap)."""
    # corpus: one 12-term monster + common terms providing df signal
    rows = [
        ("m", " ".join(f"t{i:02d}" for i in range(12))),
        # t00/t01 appear in many docs -> highest df -> first dropped
        ("c1", "t00 t01 x1"), ("c2", "t00 t01 x2"), ("c3", "t00 t01 x3"),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    capped = extract_cooccurrence_edges(
        docs, stopwords=(), max_terms_per_doc=10
    )
    terms_used = {r["src"] for r in capped.select("src").collect()} | {
        r["dst"] for r in capped.select("dst").collect()
    }
    # the monster doc lost its 2 highest-df terms' pairings only where no
    # other doc supplies them: t00-t01 survives via c1..c3, but e.g.
    # t00-t11 (only in the monster) must be gone
    assert ("t00", "t11") not in {
        (r["src"], r["dst"]) for r in capped.collect()
    }
    # lowest-df terms (t02..t11, x*) all survive
    assert {f"t{i:02d}" for i in range(2, 12)} <= terms_used
    # under-cap corpus: cap on vs off is bit-identical
    uncapped = extract_cooccurrence_edges(
        docs.filter(F.col("doc_id") != "m"), stopwords=(),
        max_terms_per_doc=None,
    )
    with_cap = extract_cooccurrence_edges(
        docs.filter(F.col("doc_id") != "m"), stopwords=(),
        max_terms_per_doc=10,
    )
    assert sorted(map(tuple, uncapped.collect())) == sorted(
        map(tuple, with_cap.collect())
    )


def test_per_doc_term_cap_preserves_duplicate_doc_multiplicity(spark):
    """The trim is keyed on the terms ARRAY VALUE (retry-deterministic —
    not monotonically_increasing_id); two identical over-cap docs must
    both survive trimming and both contribute weight."""
    rows = [
        ("m1", " ".join(f"t{i:02d}" for i in range(12))),
        ("m2", " ".join(f"t{i:02d}" for i in range(12))),  # exact duplicate
        ("c1", "t00 t01 x1"), ("c2", "t00 t01 x2"), ("c3", "t00 t01 x3"),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    capped = extract_cooccurrence_edges(docs, stopwords=(), max_terms_per_doc=10)
    got = {(r["src"], r["dst"]): r["weight"] for r in capped.collect()}
    # both duplicates trimmed identically -> the kept pair counts twice
    assert got[("t02", "t03")] == 2.0
    # the 2 highest-df terms' monster-only pairings are gone from both
    assert ("t00", "t11") not in got


def test_cap_below_one_rejected(spark):
    """cap <= 0 would keep zero terms for over-cap docs and silently
    drop them through the trim's inner join — must refuse loudly
    (None is the disable spelling)."""
    docs = spark.createDataFrame([("a", "x y")], "doc_id string, text string")
    for bad in (0, -5):
        with pytest.raises(ValueError, match="max_terms_per_doc"):
            extract_cooccurrence_edges(docs, max_terms_per_doc=bad)


def test_cap_default_off_and_opt_in_at_construct(spark):
    """extract_cooccurrence_edges defaults to NO per-doc cap (the trim's
    df is corpus-relative, so slice-callers — streaming deltas, oracle
    queries — must never inherit it silently); ConstructConfig opts in."""
    import inspect

    from sparkgatha.construct import ConstructConfig
    from sparkgatha.extract import DEFAULT_MAX_TERMS_PER_DOC

    sig = inspect.signature(extract_cooccurrence_edges)
    assert sig.parameters["max_terms_per_doc"].default is None
    assert ConstructConfig("x", "y").max_terms_per_doc == DEFAULT_MAX_TERMS_PER_DOC


def test_node_ids_safe_last_round_fix_not_fatal(spark):
    """A dictionary whose collisions are resolved exactly on the FINAL
    rehash round must succeed (regression: for/else raised even when the
    last round fixed everything)."""
    from sparkgatha.extract import node_ids_safe

    def fixed_on_round_2(col, salt):
        if salt < 2:
            return F.lit(0).cast("long")  # total collision rounds 0,1
        return F.xxhash64(col, F.lit(salt))

    docs = read_table(spark, SF, "documents")
    edges = symmetrize(extract_cooccurrence_edges(docs))
    nodes, id_edges = node_ids_safe(edges, hash_fn=fixed_on_round_2,
                                    max_rehash=2)
    assert_no_id_collisions(nodes)
    assert id_edges.count() == edges.count()


def test_node_ids_no_collisions(spark):
    docs = read_table(spark, SF, "documents")
    edges = symmetrize(extract_cooccurrence_edges(docs))
    nodes, id_edges = node_ids(edges)
    assert_no_id_collisions(nodes)
    assert id_edges.count() == edges.count()


def test_node_ids_safe_handles_forced_collision(spark):
    """G2 collision HANDLING: a hash whose salt-0 round maps every key
    to the same id (total collision) must still yield an injective
    dictionary via the deterministic salted rehash, and the id-space
    edges must round-trip to the original string edges."""
    from sparkgatha.extract import node_ids_safe

    def bad_then_good(col, salt):
        if salt == 0:
            return F.lit(0).cast("long")
        return F.xxhash64(col, F.lit(salt))

    docs = read_table(spark, SF, "documents")
    edges = symmetrize(extract_cooccurrence_edges(docs))
    nodes, id_edges = node_ids_safe(edges, hash_fn=bad_then_good)
    assert_no_id_collisions(nodes)
    assert id_edges.count() == edges.count()
    # round-trip: mapping ids back through the dictionary reproduces the
    # exact string edge multiset — the graph is correct despite the
    # collision storm
    src_m = nodes.select(F.col("id").alias("src"), F.col("key").alias("src_key"))
    dst_m = nodes.select(F.col("id").alias("dst"), F.col("key").alias("dst_key"))
    back = id_edges.join(src_m, "src").join(dst_m, "dst").select(
        F.col("src_key").alias("src"), F.col("dst_key").alias("dst"), "weight"
    )
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, edges.collect())
    )


def test_node_ids_safe_fast_path_no_join(spark):
    """Without collisions the id mapping must stay a pure projection —
    no join in the physical plan (the 100 TB fast path)."""
    from sparkgatha.extract import node_ids_safe

    docs = read_table(spark, SF, "documents")
    edges = symmetrize(extract_cooccurrence_edges(docs))
    _, id_edges = node_ids_safe(edges)
    plan = id_edges._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_corpus_deterministic_and_sha_verified(spark):
    c1 = generate_corpus(spark, 200, num_partitions=4)
    c2 = generate_corpus(spark, 200, num_partitions=13)
    r1 = sorted(map(tuple, c1.collect()))
    r2 = sorted(map(tuple, c2.collect()))
    assert r1 == r2  # partition-count independent
    m = sha_manifest(c1)
    assert verify_sha256(c2, m) == 0  # L4 per-row sha256 invariant
    # corrupting one row is detected
    bad = c1.withColumn(
        "content",
        F.when(F.col("repo") == "org0/repo0", F.lit("tampered")).otherwise(
            F.col("content")
        ),
    )
    assert verify_sha256(bad, m) > 0


def test_corpus_schema(spark):
    c = generate_corpus(spark, 50, num_partitions=2)
    assert [f.name for f in c.schema.fields] == [
        "repo", "path", "commit", "lang", "content",
    ]
    assert c.count() == 50
