"""G1/G2 — co-occurrence edge extraction + node dictionary (SURVEY.md §2.11).

Reference analog: AGATHA turns analyzed sentences into bipartite
sentence↔{lemma, entity, n-gram, mesh} edges with TF-IDF-flavored weights
(agatha/construct/graph_util.py: record_to_bipartite_edges — per SURVEY.md
§2.11 G1) and hashes string keys to ints (agatha/util/misc_util.py:
hash_str_to_int).  The graft extracts **within-document term-pair
co-occurrence** edges ``(src, dst, weight)`` from a text/content column.

Spark-first design:
 * tokenization + stopword/frequency cutoffs are pure JVM expressions
   (split / lower / array functions) so Catalyst keeps them in
   whole-stage codegen;
 * the 1-row→many-pairs expansion is the single sanctioned Python stage,
   an Arrow-batched ``mapInPandas`` (F3) — pairs are generated *locally*
   per input partition, so the only shuffle is the final groupBy(src,dst);
 * ids are ``xxhash64`` (64-bit, JVM-side) with a collision assertion at
   build time (SURVEY.md G2).

The frequency cutoff (``max_df``) is the reference's own de-facto skew
strategy — AGATHA caps hub-degree with stopword/min-frequency cutoffs
before the graph is built (SURVEY.md §4.1) — and it survives here.
"""

from __future__ import annotations

from collections.abc import Iterator

import logging

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

log = logging.getLogger(__name__)

DEFAULT_STOPWORDS = ("a", "the")

PAIR_SCHEMA = "src string, dst string, weight double"


def tokenize(
    df: DataFrame,
    text_col: str = "text",
    stopwords: tuple[str, ...] = DEFAULT_STOPWORDS,
) -> DataFrame:
    """Lower + whitespace-split + stopword removal, all JVM-side.

    Adds a ``terms`` column: *distinct, sorted* tokens per document —
    sorted so downstream pair generation emits (src < dst) canonically.
    """
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    terms = F.array_sort(
        F.array_distinct(
            F.filter(toks, lambda t: (t != "") & ~t.isin(*stopwords))
        )
    )
    return df.withColumn("terms", terms)


def _pair_expander(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """F3 mapInPandas kernel: terms array → canonical term pairs.

    Vectorized: all terms in the batch are flattened once, pair index
    arrays come from cached ``np.triu_indices`` per distinct-term count,
    and the output columns are single fancy-indexing gathers — no
    per-pair Python.
    """
    import numpy as np

    triu_cache: dict[int, tuple] = {}
    for pdf in batches:
        flat: list = []
        src_idx: list = []
        dst_idx: list = []
        offset = 0
        for terms in pdf["terms"]:
            k = len(terms)
            flat.append(np.asarray(terms, dtype=object))
            if k >= 2:
                iu = triu_cache.get(k)
                if iu is None:
                    iu = np.triu_indices(k, 1)
                    triu_cache[k] = iu
                src_idx.append(iu[0] + offset)
                dst_idx.append(iu[1] + offset)
            offset += k
        if not src_idx:
            yield pd.DataFrame({"src": [], "dst": [], "weight": []})
            continue
        allt = np.concatenate(flat)
        si = np.concatenate(src_idx)
        di = np.concatenate(dst_idx)
        yield pd.DataFrame(
            {
                "src": allt[si],
                "dst": allt[di],
                "weight": np.ones(len(si), dtype=np.float64),
            }
        )


DEFAULT_MAX_TERMS_PER_DOC = 1024


def _cap_terms_per_doc(toks: DataFrame, cap: int) -> DataFrame:
    """Trim docs with more than ``cap`` distinct terms down to their
    ``cap`` lowest-df terms (ties broken lexicographically).

    The quadratic pair fan-out makes one pathological row (a generated
    file with 10k distinct identifiers) emit tens of millions of pairs;
    this is the standard per-doc guard beside the corpus-level max_df
    cutoff.  Cost model: ONE light detection scan (tokenize + size
    filter + limit(1), early-exiting as soon as any over-cap doc is
    found — no aggregation, no shuffle); ONLY when a doc is actually
    over the cap does the trim lineage run, and it explodes/shuffles
    ONLY the offending rows (df ranking joins against the
    vocabulary-sized frequency table).

    Determinism: the trim is keyed on the terms ARRAY VALUE itself, not
    a generated row id — ``monotonically_increasing_id`` through an
    explode→join→window shuffle chain can renumber recomputed
    partitions on task retry, splitting one doc's terms across two
    groups and silently changing the emitted pairs.  Value keying is
    retry-stable; identical over-cap docs trim identically, and row
    multiplicity is restored by joining the per-value trim result back
    to the over-cap rows.
    """
    over = toks.filter(F.size("terms") > cap)
    if over.limit(1).count() == 0:
        return toks
    log.warning(
        "per-doc term cap hit: at least one doc exceeds %d distinct "
        "terms; keeping the %d lowest-df terms of each offending doc",
        cap, cap,
    )
    dfreq = (
        toks.select(F.explode("terms").alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )
    ex = (
        over.select("terms").distinct()
        .select("terms", F.explode("terms").alias("term"))
        .join(dfreq, "term")
    )
    w = Window.partitionBy("terms").orderBy(
        F.col("df").asc(), F.col("term").asc()
    )
    trimmed_map = (
        ex.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .groupBy("terms")
        .agg(F.array_sort(F.collect_list("term")).alias("_trimmed"))
    )
    trimmed = over.join(trimmed_map, "terms").select(
        F.col("_trimmed").alias("terms")
    )
    return toks.filter(F.size("terms") <= cap).unionByName(trimmed)


def extract_cooccurrence_edges(
    docs: DataFrame,
    text_col: str = "text",
    stopwords: tuple[str, ...] = DEFAULT_STOPWORDS,
    min_weight: float = 0.0,
    max_df: float | None = None,
    symmetric: bool = False,
    num_partitions: int | None = None,
    weight_mode: str = "count",
    max_terms_per_doc: int | None = None,
) -> DataFrame:
    """documents → canonical co-occurrence edges ``(src, dst, weight)``.

    ``weight_mode='count'`` (default): weight = number of documents in
    which the pair co-occurs.
    ``weight_mode='idf'``: weight = co-count x mean(idf(src), idf(dst))
    with idf(t) = ln(n_docs / df(t));  ``weight_mode='pmi'``: weight =
    ln(co-count · n_docs / (df(src) · df(dst))) — pointwise mutual
    information, the reference's TF-IDF-flavored
    term-edge weighting (AGATHA's term↔sentence edges are TF-IDF-ish,
    SURVEY.md §2.11 G1): hub terms that co-occur everywhere carry less
    weight.  The document-frequency table is vocabulary-sized (an A2
    aggregation), so the idf joins shuffle edges against a table orders
    of magnitude smaller than the edge set; ``min_weight`` always
    applies to the raw co-count, before idf/pmi scaling.
    ``max_df`` (fraction of docs) drops hub terms *before* pairing —
    the reference's frequency-cutoff skew control.
    ``max_terms_per_doc`` caps the quadratic per-document pair fan-out:
    max_df caps hub *terms*, but a single 10k-distinct-identifier source
    file still emits 5x10^7 pairs from one row.  Docs over the cap keep
    their ``max_terms_per_doc`` *lowest-df* terms (the same lever as
    max_df: the most corpus-common terms are the first to go), trimmed
    only for the offending rows — under-cap docs never touch the trim
    shuffle — and the event is logged (no silent caps, SURVEY.md G10).
    The cap is OPT-IN (default ``None``, fully lazy): the df used for
    trimming is computed over the corpus visible to THIS call, so a
    default-on cap would silently change semantics for callers that
    process the corpus in slices — the streaming delta merge (ST6)
    would trim by batch-local df and diverge from a full rebuild, and
    oracle-checked callers would need the cap replayed in SQL.  Entry
    points that face untrusted whole corpora opt in explicitly
    (ConstructConfig.max_terms_per_doc defaults to
    ``DEFAULT_MAX_TERMS_PER_DOC``).
    ``symmetric=True`` additionally emits the reversed orientation
    (U1 union) for algorithms that want both directions stored.

    The pair expansion parallelizes per input partition; a narrow input
    must not serialize the Python stage, so inputs below
    ``num_partitions`` (default: the session's default parallelism)
    partitions are repartitioned first — at 100 TB the scan's own
    splits already provide the parallelism and the branch is a no-op.

    Width is judged by the plan's partition count via an
    ``rdd.getNumPartitions()`` peek (no data through the RDD API — the
    engine's B:15 "DataFrame, not RDD" rule is about execution paths).
    This is deliberate: every lazy proxy regresses at scale in one
    direction or the other — a file COUNT reads wrong both ways (Spark
    packs small files many-to-one, so many tiny files under-report
    width and the quadratic Python stage runs near-serial; conversely
    few huge files split many-to-many, so the proxy forces a pointless
    full-corpus shuffle), and ``inputFiles()`` itself collects every
    path to the driver, which at the 10^12-file regime is its own
    hazard.  The peek runs with AQE scoped OFF: under AQE,
    ``Dataset.rdd`` eagerly EXECUTES every upstream shuffle stage to
    finalize the adaptive plan — a derived input (join/filter lineage)
    would run its whole upstream twice.  Without AQE the RDD is built
    lazily and the peek launches no job; the count it reports is the
    static plan's (AQE may still coalesce at runtime, which only
    matters for shuffle-derived inputs — callers with such lineage and
    a hard width requirement pass ``num_partitions``).
    """
    from sparkgatha.util import no_aqe

    spark = docs.sparkSession
    target = num_partitions or spark.sparkContext.defaultParallelism
    with no_aqe(spark):
        width = docs.rdd.getNumPartitions()
    if width < target:
        docs = docs.repartition(target)
    toks = tokenize(docs, text_col, stopwords).select("terms")

    # one corpus count serves both the max_df threshold and the idf
    # numerator (was two scans when both levers were set)
    n_docs = (
        docs.count()
        if (max_df is not None or weight_mode in ("idf", "pmi"))
        else None
    )

    if max_df is not None:
        hot_terms = sorted(
            r["term"]
            for r in (
                toks.select(F.explode("terms").alias("term"))
                .groupBy("term")
                .agg(F.count("*").alias("df"))
                .filter(F.col("df") > max_df * n_docs)
                .select("term")
                .collect()
            )
        )
        # the hot set is provably small (at most avg-distinct-terms-per-doc
        # / max_df terms can exceed the df threshold), so it rides into a
        # JVM-side array_except — shuffle-free per-row filtering; the
        # allowed set (the whole vocabulary) would NOT be collectable at
        # corpus scale
        if hot_terms:
            toks = toks.select(
                F.array_sort(
                    F.array_except(
                        F.col("terms"), F.array(*[F.lit(t) for t in hot_terms])
                    )
                ).alias("terms")
            )

    if max_terms_per_doc is not None:
        if max_terms_per_doc < 1:
            # a cap <= 0 would keep zero terms for over-cap docs and the
            # trim's inner join would silently drop every such document
            # (an "empty graph, exit 0" failure) — refuse loudly; None
            # is the disable spelling
            raise ValueError(
                f"max_terms_per_doc must be >= 1 or None, got {max_terms_per_doc}"
            )
        toks = _cap_terms_per_doc(toks, max_terms_per_doc)

    pairs = toks.mapInPandas(_pair_expander, schema=PAIR_SCHEMA)
    edges = (
        pairs.groupBy("src", "dst")
        .agg(F.sum("weight").alias("weight"))
    )
    if min_weight > 0:
        edges = edges.filter(F.col("weight") >= min_weight)
    if weight_mode == "idf":
        dfreq = (
            toks.select(F.explode("terms").alias("term"))
            .groupBy("term")
            .agg(F.count("*").alias("df"))
        )
        idf = lambda alias: dfreq.select(  # noqa: E731
            F.col("term").alias(alias),
            F.log(F.lit(float(n_docs)) / F.col("df")).alias(f"idf_{alias}"),
        )
        edges = (
            edges.join(idf("src"), "src")
            .join(idf("dst"), "dst")
            .select(
                "src",
                "dst",
                (
                    F.col("weight")
                    * (F.col("idf_src") + F.col("idf_dst"))
                    / 2.0
                ).alias("weight"),
            )
        )
    elif weight_mode == "pmi":
        # pointwise mutual information over document co-occurrence:
        # p(u,v) = cnt/N, p(t) = df(t)/N  →  PMI = ln(cnt·N / (df_u·df_v)).
        # Negative values are kept — "both common, rarely together" is
        # signal the reference's semantic weighting uses, and dropping
        # them silently would change the graph's degree profile
        dfreq = (
            toks.select(F.explode("terms").alias("term"))
            .groupBy("term")
            .agg(F.count("*").alias("df"))
        )
        dfc = lambda alias: dfreq.select(  # noqa: E731
            F.col("term").alias(alias), F.col("df").alias(f"df_{alias}")
        )
        edges = (
            edges.join(dfc("src"), "src")
            .join(dfc("dst"), "dst")
            .select(
                "src",
                "dst",
                F.log(
                    F.col("weight")
                    * F.lit(float(n_docs))
                    # cast BEFORE multiplying: df*df as long x long silently
                    # overflows in non-ANSI Spark once df reaches ~3e9
                    / (F.col("df_src").cast("double") * F.col("df_dst"))
                ).alias("weight"),
            )
        )
    elif weight_mode != "count":
        raise ValueError(f"unknown weight_mode: {weight_mode!r}")
    if symmetric:
        edges = symmetrize(edges)
    return edges


def extract_adjacency_edges(
    docs: DataFrame,
    text_col: str = "text",
    stopwords: tuple[str, ...] = DEFAULT_STOPWORDS,
    directed: bool = False,
) -> DataFrame:
    """G1 variant — window-1 (adjacent-token) co-occurrence edges.

    The document-level expander connects EVERY term pair in a doc; this
    one connects only tokens that appear side by side, the bounded-
    window co-occurrence the reference uses for its tighter relations
    (sentence/window-scoped edges rather than whole-abstract).  The
    resulting graph is far sparser and keeps non-adjacent 2-hop pairs —
    the candidate set link prediction needs.

    Pairs are formed over RAW token positions (a stopword neighbor
    drops the pair rather than bridging across it), then filtered and
    canonicalized.  Output: (src, dst, weight) with src < dst, weight =
    occurrence count.  ``directed=True`` keeps the token ORDER instead
    of canonicalizing — (src → dst) means "src immediately precedes
    dst" — the directed bigram graph the SCC / reachability queries
    consume.

    Physical shape: split → two slices → arrays_zip → explode → filter
    → partial-agg groupBy, all JVM whole-stage-codegen expressions — no
    Python stage at all (unlike the all-pairs expander, adjacency needs
    no triangular index, so the JVM builtins express it directly).
    """
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    n = F.size("t")
    zipped = (
        docs.select(toks.alias("t"))
        .select(
            F.slice("t", 1, F.greatest(n - 1, F.lit(0))).alias("l"),
            F.slice("t", 2, F.greatest(n - 1, F.lit(0))).alias("r"),
        )
        .select(F.explode(F.arrays_zip("l", "r")).alias("p"))
        .select(F.col("p.l").alias("x"), F.col("p.r").alias("y"))
    )
    keep = (
        (F.col("x") != "")
        & (F.col("y") != "")
        & (F.col("x") != F.col("y"))
        & ~F.col("x").isin(*stopwords)
        & ~F.col("y").isin(*stopwords)
    )
    if directed:
        oriented = zipped.filter(keep).select(
            F.col("x").alias("src"), F.col("y").alias("dst")
        )
    else:
        oriented = zipped.filter(keep).select(
            F.least("x", "y").alias("src"),
            F.greatest("x", "y").alias("dst"),
        )
    return oriented.groupBy("src", "dst").agg(F.count("*").alias("weight"))


def top_k_out_edges(edges: DataFrame, k: int) -> DataFrame:
    """Keep each src's k strongest out-edges (weight desc, dst asc —
    the W4 tie-break both engines' oracles replicate as a row_number
    window).  The deterministic sparsifier behind the SCC / reachability
    / truss fixture graphs: shared here so the Spark side and every
    oracle CTE (_topk_digraph_cte) pin ONE tie-break convention."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = Window.partitionBy("src").orderBy(
        F.col("weight").desc(), F.col("dst").asc()
    )
    return (
        edges.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("src", "dst", "weight")
    )


def symmetrize(edges: DataFrame) -> DataFrame:
    """U1: store both orientations of each undirected edge."""
    rev = edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
    )
    return edges.unionByName(rev)


def node_ids(edges: DataFrame) -> tuple[DataFrame, DataFrame]:
    """G2: string keys → dense 64-bit ids via xxhash64.

    Returns (nodes, id_edges):
      nodes(id long, key string) — the dictionary;
      id_edges(src long, dst long, weight double).

    Collision check is the caller's job at build time via
    ``assert_no_id_collisions`` (cheap distinct-count compare).
    """
    nodes = (
        edges.select(F.col("src").alias("key"))
        .unionByName(edges.select(F.col("dst").alias("key")))
        .distinct()
        .select(F.xxhash64("key").alias("id"), "key")
    )
    id_edges = edges.select(
        F.xxhash64("src").alias("src"),
        F.xxhash64("dst").alias("dst"),
        "weight",
    )
    return nodes, id_edges


def assert_no_id_collisions(nodes: DataFrame) -> None:
    n_keys = nodes.select("key").distinct().count()
    n_ids = nodes.select("id").distinct().count()
    if n_keys != n_ids:
        raise RuntimeError(
            f"xxhash64 id collision: {n_keys} keys -> {n_ids} ids"
        )


def _default_hash(key, salt: int):
    return F.xxhash64(key, F.lit(salt))


def node_ids_safe(
    edges: DataFrame,
    hash_fn=None,
    max_rehash: int = 8,
) -> tuple[DataFrame, DataFrame]:
    """G2 with collision HANDLING (not just detection): the build path
    for key cardinalities where 64-bit collisions are expected — the
    birthday bound puts xxhash64 at ~50% collision probability around
    5x10^9 keys, so at the 10^12 scale a detect-and-die build is a
    guaranteed death (the round-1 ``assert_no_id_collisions`` behavior).

    Strategy, fully deterministic:
      1. id = hash(key, salt=0) for every distinct key;
      2. while any id is shared by >1 key: rehash ALL keys in colliding
         buckets with the next salt (the colliding set is birthday-tiny,
         so the per-round work is one count-per-id aggregation plus a
         broadcast-joined fix-up of a handful of rows);
      3. if collisions survive (injective dictionary): edges map through
         the dictionary join; if salt 0 was already injective, edges map
         by direct hashing — zero joins, the fast path.

    ``hash_fn(col, salt) -> Column`` is pluggable so tests can force
    collisions with a deliberately narrow hash.
    Returns (nodes(id, key), id_edges(src, dst, weight)).
    """
    h = hash_fn or _default_hash
    keys = (
        edges.select(F.col("src").alias("key"))
        .unionByName(edges.select(F.col("dst").alias("key")))
        .distinct()
    )
    nodes = keys.select(h(F.col("key"), 0).alias("id"), "key").localCheckpoint(
        eager=True
    )
    rehashed = False
    # check-then-rehash, with the duplicate check running once more AFTER
    # the final rehash round so all max_rehash rounds are usable (a
    # dictionary fixed on the last round must not die as "still colliding")
    for salt in range(1, max_rehash + 2):
        dup_ids = (
            nodes.groupBy("id")
            .agg(F.count("*").alias("k"))
            .filter(F.col("k") > 1)
            .select(F.col("id").alias("dup_id"))
        )
        if dup_ids.limit(1).count() == 0:
            break
        if salt > max_rehash:
            raise RuntimeError(
                f"node id dictionary still has collisions after {max_rehash} "
                "salted rehash rounds — the hash is too narrow for the key "
                "cardinality"
            )
        rehashed = True
        nodes = nodes.join(
            F.broadcast(dup_ids), nodes.id == dup_ids.dup_id, "left"
        ).select(
            F.when(
                F.col("dup_id").isNotNull(), h(F.col("key"), salt)
            )
            .otherwise(F.col("id"))
            .alias("id"),
            "key",
        ).localCheckpoint(eager=True)

    if not rehashed:
        id_edges = edges.select(
            h(F.col("src"), 0).alias("src"),
            h(F.col("dst"), 0).alias("dst"),
            "weight",
        )
    else:
        src_map = nodes.select(F.col("key").alias("src"), F.col("id").alias("src_id"))
        dst_map = nodes.select(F.col("key").alias("dst"), F.col("id").alias("dst_id"))
        id_edges = (
            edges.join(src_map, "src")
            .join(dst_map, "dst")
            .select(
                F.col("src_id").alias("src"),
                F.col("dst_id").alias("dst"),
                "weight",
            )
        )
    return nodes, id_edges
