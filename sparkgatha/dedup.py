"""Training-data-pipeline dedup suite over the ``documents`` table —
exact, MinHash(+LSH), SimHash, n-gram Jaccard, embedding-cosine.

These are first-class engine operators (task brief: what a 100 TB
training-data pipeline needs), each registered in the DuckDB-checked
query registry.  Cross-engine determinism rule: every hash that appears
in a checked result is md5-derived — ``conv(substr(md5(x),1,15),16,10)``
in Spark ≡ ``('0x' || substr(md5(x),1,15))::BIGINT`` in DuckDB (60-bit,
always non-negative, fits BIGINT).

Scale notes (100 TB path):
  * exact dedup is a single hash-groupBy — shuffles once on the digest;
  * MinHash signatures are computed per-row (no shuffle), LSH banding
    turns near-dup search into an equi-join on (band, band_hash) —
    candidates only, verified by exact Jaccard on the candidate pairs;
  * the all-pairs oracles (*_pairs queries) exist for correctness at
    sf0.01; at scale only the banded path runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from sparkgatha.relational import _t, register
from sparkgatha.util import md5_long as _md5_long, ws_tokens  # shared hash/tokenize conventions

def _widen(docs: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Narrow scans must not serialize the shingle/md5 stage (r6 — the
    extract.py discipline applied to the dedup roots): the fixture
    corpus is ONE parquet row group, so every downstream per-row hash
    ran in a single task (measured 4-6 s single-task broadcast builds
    in the sf0.1 dedup queries).  Inputs below the target width are
    round-robin repartitioned — deterministic (sort-before-repartition
    stays on) and value-free (every dedup quantity is md5/integer/exact
    arithmetic); at 100 TB the scan's own splits already provide the
    width and the branch is a no-op.  The width peek is the
    ``rdd.getNumPartitions()`` metadata read under no-AQE that
    extract.py documents (no data through the RDD API)."""
    from sparkgatha.util import no_aqe

    spark = docs.sparkSession
    target = num_partitions or spark.sparkContext.defaultParallelism
    with no_aqe(spark):
        width = docs.rdd.getNumPartitions()
    if width < target:
        docs = docs.repartition(target)
    return docs


N_SHINGLE = 3          # word-shingle width
N_HASHES = 16          # minhash signature length
N_BANDS = 4            # LSH bands (rows-per-band = N_HASHES / N_BANDS)
SIMHASH_BITS = 32
#: minhash lane modulus (2^58).  Sized so the double-hash lane
#: arithmetic h1 + i·(h2 % 2^58) stays inside signed 64-bit for
#: i < N_HASHES (15·2^58 + 2^60 < 2^63) — BOTH engines evaluate it in
#: plain BIGINT, no HUGEINT promotion, no overflow.
_MH_MOD = 1 << 58


def _shingles(text_col: str = "text"):
    """Distinct word n-gram shingles per document (JVM-side)."""
    toks = ws_tokens(text_col)
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - N_SHINGLE, F.lit(0)))
    return F.array_distinct(
        F.when(
            n >= N_SHINGLE,
            F.transform(
                idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, N_SHINGLE))
            ),
        ).otherwise(F.array(F.concat_ws(" ", toks)))
    )


# DuckDB mirror of _shingles as a CTE body (documents → doc_id, shingle)
_SHINGLES_SQL = """
  tok AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                       x -> x <> '') AS toks
    FROM documents
  ),
  sh AS (
    SELECT DISTINCT doc_id, shingle FROM (
      SELECT doc_id,
             unnest(CASE WHEN len(toks) >= {N}
                  THEN list_transform(range(1, len(toks) - {N} + 2),
                       i -> array_to_string(toks[i : i + {N} - 1], ' '))
                  ELSE [array_to_string(toks, ' ')]
             END) AS shingle
      FROM tok
    )
  )
""".replace("{N}", str(N_SHINGLE))


@register(
    "q_dedup_exact",
    """
    SELECT md5(text) AS content_md5,
           min(doc_id) AS keep_doc_id,
           count(*) AS n_copies
    FROM documents GROUP BY md5(text)
    """,
)
def q_dedup_exact(spark, sf_dir):
    """Exact dedup: hash-groupBy on the content digest, keep min id.
    One shuffle on the digest; at 100 TB the digest groupBy is the only
    wide stage and AQE coalesces the tiny post-agg partitions."""
    d = _t(spark, sf_dir, "documents")
    return d.groupBy(F.md5("text").alias("content_md5")).agg(
        F.min("doc_id").alias("keep_doc_id"),
        F.count("*").alias("n_copies"),
    )


@register(
    "q_dedup_minhash",
    f"""
    WITH {_SHINGLES_SQL},
    hashes AS (
      SELECT doc_id, h.i::INTEGER AS hash_idx,
             min((('0x' || substr(md5(shingle), 1, 15))::BIGINT
                  + h.i * ((('0x' || substr(md5(':' || shingle), 1, 15))::BIGINT)
                           % {_MH_MOD}))
                 % {_MH_MOD}) AS minhash
      FROM sh, (SELECT unnest(range({N_HASHES})) AS i) h
      GROUP BY doc_id, h.i
    )
    SELECT doc_id, hash_idx, minhash FROM hashes
    """,
)
def q_dedup_minhash(spark, sf_dir):
    """MinHash signatures via Kirsch–Mitzenmacher double hashing:
    lane_i(shingle) = (h1 + i·(h2 mod 2^58)) mod 2^58 with
    h1 = md5_long(shingle), h2 = md5_long(':' || shingle) — TWO md5
    evaluations per shingle instead of N_HASHES (measured 2.6× on the
    whole near-dup pipeline at sf0.1), same cross-engine md5 rule, and
    the minimum is taken per lane over a doc's shingles.  Computed
    fully JVM-side (explode → groupBy); the two hashes are projected
    per shingle BEFORE the lane fan-out so md5 runs 2× per shingle,
    not 2×N_HASHES."""
    d = _widen(_t(spark, sf_dir, "documents"))
    sh = d.select(
        "doc_id",
        F.explode(_shingles()).alias("shingle"),
    ).select(
        "doc_id",
        _md5_long(F.col("shingle")).alias("h1"),
        F.pmod(
            _md5_long(F.concat(F.lit(":"), F.col("shingle"))),
            F.lit(_MH_MOD),
        ).alias("h2m"),
    )
    idx = spark.range(N_HASHES).select(F.col("id").cast("int").alias("hash_idx"))
    return (
        sh.crossJoin(F.broadcast(idx))
        .groupBy("doc_id", "hash_idx")
        .agg(
            F.min(
                F.pmod(
                    F.col("h1")
                    + F.col("hash_idx").cast("long") * F.col("h2m"),
                    F.lit(_MH_MOD),
                )
            ).alias("minhash")
        )
    )


_SIG_INIT = 1 << 62  # > any 60-bit _md5_long value; folded away by least()


def minhash_signatures(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, sig array<bigint>) — zero-shuffle signature computation.

    Two layers of hash-evaluation economy, each measured:

    1. Single-pass fold: ``aggregate(shingles, [MAX]*k, least-per-lane)``
       evaluates the (expensive) shingle-array expression ONCE per row
       and touches each shingle once, updating all k lanes via zip_with.
       The earlier lanes-outer form (``transform(0..k-1, i ->
       array_min(...))``) re-evaluated the whole shingle construction
       per lane — measured 16× the cost (69 s -> 13 s at sf0.1).
    2. Kirsch–Mitzenmacher double hashing (ESA 2006 — the standard
       Bloom-filter/MinHash trick): lane_i = (h1 + i·h2m) mod 2^58 with
       h1 = md5_long(shingle), h2m = md5_long(':' || shingle) mod 2^58,
       computed once per shingle in an inner ``transform`` so md5 runs
       2× per shingle instead of N_HASHES× — measured 2.6× on the
       composed near-dup pipeline at sf0.1 (13.2 s -> 5.0 s).  The
       DuckDB oracles replay the identical arithmetic (_BANDS_CAND_SQL);
       all operands are non-negative 60-bit values so Spark pmod ≡
       DuckDB %, and 15·2^58 + 2^60 < 2^63 keeps every intermediate in
       BIGINT.

    ``_shingles`` never yields an empty array (short docs fold to one
    joined-token shingle), so the MAX sentinel never survives (lanes
    are < 2^58 < _SIG_INIT)."""
    docs = _widen(docs)
    hs = F.transform(
        _shingles(text_col),
        lambda s: F.struct(
            _md5_long(s).alias("h1"),
            F.pmod(
                _md5_long(F.concat(F.lit(":"), s)), F.lit(_MH_MOD)
            ).alias("h2m"),
        ),
    )
    lanes = lambda h: F.transform(  # noqa: E731 — the oracle lane formula
        F.sequence(F.lit(0), F.lit(N_HASHES - 1)),
        lambda i: F.pmod(
            h["h1"] + i.cast("long") * h["h2m"], F.lit(_MH_MOD)
        ),
    )
    sig = F.aggregate(
        hs,
        F.array(*[F.lit(_SIG_INIT).cast("long")] * N_HASHES),
        lambda acc, h: F.zip_with(acc, lanes(h), lambda a, b: F.least(a, b)),
    )
    return docs.select("doc_id", sig.alias("sig"))


#: LSH buckets larger than this skip pairwise candidate generation — a
#: degenerate bucket (e.g. empty docs sharing one signature) would
#: otherwise put O(cap^2) pair rows in one join partition.  Over-cap
#: buckets are NOT dropped: their members route to a star fallback —
#: each member pairs with the bucket's min doc_id only (O(size) rows),
#: so a cluster of >cap near-identical docs still collapses through the
#: verify + keep-min stages instead of silently surviving.
DEFAULT_BUCKET_CAP = 64


def lsh_bands(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, band int, sig string) — per-document LSH band signatures.

    sig = md5 of the comma-joined minhash slice, so the band join key is
    identical in Spark and the DuckDB oracle (md5 is the cross-engine
    hash rule; production could swap xxhash64 for compactness since the
    sig never appears in a checked output by itself)."""
    rows_per_band = N_HASHES // N_BANDS
    sigs = minhash_signatures(docs, text_col)
    return sigs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(N_BANDS - 1)),
                lambda b: F.struct(
                    b.cast("int").alias("band"),
                    F.md5(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                                lambda x: x.cast("string"),
                            ),
                        )
                    ).alias("sig"),
                ),
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.sig")


def lsh_candidates(
    docs: DataFrame,
    text_col: str = "text",
    bucket_cap: int = DEFAULT_BUCKET_CAP,
) -> DataFrame:
    """LSH banding: (band, band-signature) buckets → candidate pairs
    (doc_a < doc_b).  The scale path for near-dup: equi-join on the band
    key, no all-pairs; buckets above ``bucket_cap`` take the star
    fallback — each member pairs with the bucket min only (see
    DEFAULT_BUCKET_CAP), bounding any bucket's pair fan-out at O(size)."""
    # banding is consumed by three lineages (bucket counts, join side a,
    # join side b) — materialize it once instead of re-shingling 3x
    bands = lsh_bands(docs, text_col).localCheckpoint(eager=False)
    counts = bands.groupBy("band", "sig").agg(
        F.count("*").alias("k"), F.min("doc_id").alias("m")
    )
    ok = (
        counts.filter((F.col("k") >= 2) & (F.col("k") <= bucket_cap))
        .select("band", "sig")
    )
    inb = bands.join(ok, ["band", "sig"])
    a = inb.alias("a")
    b = inb.alias("b")
    pairwise = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
    )
    over = counts.filter(F.col("k") > bucket_cap).select("band", "sig", "m")
    star = (
        bands.join(over, ["band", "sig"])
        .filter(F.col("doc_id") != F.col("m"))
        .select(F.col("m").alias("doc_a"), F.col("doc_id").alias("doc_b"))
    )
    return pairwise.unionByName(star).distinct()


def verified_near_dup_pairs(
    docs: DataFrame,
    text_col: str = "text",
    threshold: float = 0.8,
    bucket_cap: int = DEFAULT_BUCKET_CAP,
) -> DataFrame:
    """(doc_a, doc_b, jaccard) — LSH candidates verified by EXACT n-gram
    Jaccard computed only on the candidate pairs (never all-pairs)."""
    # materialize the (possibly expensive) upstream lineage once — the
    # LSH path, the shingle explode, and the size agg all hang off it
    d = _widen(
        docs.select("doc_id", F.col(text_col).alias("text"))
    ).localCheckpoint(eager=False)
    cand = lsh_candidates(d, "text", bucket_cap)
    # the shingle table feeds three consumers (sizes, join side a, join
    # side b) — shingle once, not 3x
    sh = d.select("doc_id", F.explode(_shingles()).alias("shingle")).localCheckpoint(
        eager=False
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    sha = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingle").alias("sh_a"))
    shb = sh.select(F.col("doc_id").alias("b_id"), F.col("shingle").alias("sh_b"))
    inter = (
        cand.join(sha, "doc_a")
        .join(
            shb,
            (F.col("doc_b") == F.col("b_id")) & (F.col("sh_a") == F.col("sh_b")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("ix"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("ix") / (F.col("na") + F.col("nb") - F.col("ix"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(jac >= threshold)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


def near_duplicates(
    docs: DataFrame,
    text_col: str = "text",
    threshold: float = 0.8,
    bucket_cap: int = DEFAULT_BUCKET_CAP,
) -> DataFrame:
    """End-to-end near-dup operator: (dup_doc_id, keep_doc_id) — the
    pipeline composition a training-data user actually calls:

        LSH banding (bucketed equi-join, capped)
          → exact-Jaccard verification on candidates only
          → canonical keep-min (a dup maps to its smallest verified
            partner)

    Anti-joining documents against the dup side of the result is the
    dedup filter.  Keep-min is per-pair, not transitive; fully
    transitive canonicalization is connected_components (G5) over the
    verified-pair graph — compose when chains matter.  Every stage here
    is a bucketed equi-join or a partial-aggregable groupBy — no
    all-pairs anywhere, 100 TB safe."""
    pairs = verified_near_dup_pairs(docs, text_col, threshold, bucket_cap)
    return pairs.groupBy(F.col("doc_b").alias("dup_doc_id")).agg(
        F.min("doc_a").alias("keep_doc_id")
    )


_RPB = N_HASHES // N_BANDS

# shared oracle CTE chain: shingles (sh) → minhash bands → candidate set
# with the star fallback for over-cap buckets (mirrors lsh_candidates).
# Lane formula = Kirsch–Mitzenmacher double hashing (see
# minhash_signatures): two md5s per shingle, lanes derived
# arithmetically — BIGINT-safe (15·2^58 + 2^60 < 2^63) and identical
# in both engines (all operands non-negative, so % ≡ pmod).
_BANDS_CAND_SQL = f"""
    hashes AS (
      SELECT doc_id, h.i::INTEGER AS hash_idx,
             min((('0x' || substr(md5(shingle), 1, 15))::BIGINT
                  + h.i * ((('0x' || substr(md5(':' || shingle), 1, 15))::BIGINT)
                           % {_MH_MOD}))
                 % {_MH_MOD}) AS minhash
      FROM sh, (SELECT unnest(range({N_HASHES})) AS i) h
      GROUP BY doc_id, h.i
    ),
    bands AS (
      SELECT doc_id, (hash_idx // {_RPB})::INTEGER AS band,
             md5(string_agg(minhash::VARCHAR, ',' ORDER BY hash_idx)) AS sig
      FROM hashes GROUP BY doc_id, hash_idx // {_RPB}
    ),
    ok AS (
      SELECT band, sig FROM bands GROUP BY band, sig
      HAVING count(*) BETWEEN 2 AND {DEFAULT_BUCKET_CAP}
    ),
    over AS (
      SELECT band, sig, min(doc_id) AS m FROM bands GROUP BY band, sig
      HAVING count(*) > {DEFAULT_BUCKET_CAP}
    ),
    cand AS (
      SELECT DISTINCT doc_a, doc_b FROM (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a
        JOIN ok USING (band, sig)
        JOIN bands b ON a.band = b.band AND a.sig = b.sig
                    AND a.doc_id < b.doc_id
        UNION ALL
        SELECT o.m AS doc_a, b.doc_id AS doc_b
        FROM bands b JOIN over o ON b.band = o.band AND b.sig = o.sig
        WHERE b.doc_id <> o.m
      )
    )
"""


@register(
    "q_near_duplicates",
    f"""
    WITH {_SHINGLES_SQL},
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    {_BANDS_CAND_SQL},
    inter AS (
      SELECT c.doc_a, c.doc_b, count(*) AS ix
      FROM cand c
      JOIN sh a ON a.doc_id = c.doc_a
      JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
      GROUP BY c.doc_a, c.doc_b
    )
    SELECT doc_b AS dup_doc_id, min(doc_a) AS keep_doc_id
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE ix * 1.0 / (sa.n + sb.n - ix) >= 0.8
    GROUP BY doc_b
    """,
)
def q_near_duplicates(spark, sf_dir):
    """The composed near-dup pipeline, end-to-end value-checked: the
    oracle replays LSH banding (same md5-derived minhashes and band
    signatures, same bucket cap) + exact-Jaccard verify + keep-min in
    pure SQL."""
    return near_duplicates(_t(spark, sf_dir, "documents"))


def near_duplicate_clusters(
    docs: DataFrame,
    text_col: str = "text",
    threshold: float = 0.8,
    bucket_cap: int = DEFAULT_BUCKET_CAP,
) -> DataFrame:
    """(doc_id, cluster_id) — TRANSITIVE near-dup canonicalization: the
    verified-pair graph closed under connectivity (G5 small-star/large-
    star over the pairs), cluster_id = smallest doc_id in the cluster.

    This is the "compose when chains matter" path the per-pair keep-min
    of :func:`near_duplicates` deliberately avoids: A~B~C with A!~C
    still collapses to one canonical A here.  Only documents appearing
    in >=1 verified pair are returned (singletons are their own cluster
    trivially).  Scale shape: the pair graph is tiny relative to the
    corpus (candidates are LSH-bounded), so the CC supersteps run on the
    dup subgraph only."""
    from sparkgatha.graph.cc import connected_components

    pairs = verified_near_dup_pairs(docs, text_col, threshold, bucket_cap)
    e = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"),
        F.lit(1.0).alias("weight"),
    )
    # materialize the (tiny) pair graph ONCE before the CC supersteps —
    # connected_components evaluates its input twice (vertex set +
    # canonical edge table), and without this checkpoint each
    # evaluation re-runs the whole LSH+verify pipeline (the q_modularity
    # 30 s → 5.4 s lesson, applied here: ~2.2 s off the sf0.1 wall)
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"),
                 "weight")
    ).localCheckpoint(eager=True)
    cc = connected_components(sym)
    return cc.select(
        F.col("vertex").alias("doc_id"), F.col("component").alias("cluster_id")
    )


@register(
    "q_near_dup_clusters",
    f"""
    WITH RECURSIVE {_SHINGLES_SQL},
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    {_BANDS_CAND_SQL},
    inter AS (
      SELECT c.doc_a, c.doc_b, count(*) AS ix
      FROM cand c
      JOIN sh a ON a.doc_id = c.doc_a
      JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
      GROUP BY c.doc_a, c.doc_b
    ),
    ver AS (
      SELECT doc_a, doc_b FROM inter
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE ix * 1.0 / (sa.n + sb.n - ix) >= 0.8
    ),
    und AS (
      SELECT doc_a AS a, doc_b AS b FROM ver
      UNION SELECT doc_b, doc_a FROM ver
    ),
    reach(a, b) AS (
      SELECT a, b FROM und
      UNION
      SELECT r.a, u.b FROM reach r JOIN und u ON u.a = r.b
    )
    SELECT a AS doc_id, least(a, min(b)) AS cluster_id
    FROM reach GROUP BY a
    """,
)
def q_near_dup_clusters(spark, sf_dir):
    """Transitive near-dup clusters, value-checked against the SQL
    replay of the whole pipeline plus a recursive-CTE closure over the
    verified pairs (the q_g5 pattern on the dup subgraph)."""
    return near_duplicate_clusters(_t(spark, sf_dir, "documents"))


@register(
    "q_modularity",
    f"""
    WITH RECURSIVE {_SHINGLES_SQL},
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    {_BANDS_CAND_SQL},
    inter AS (
      SELECT c.doc_a, c.doc_b, count(*) AS ix
      FROM cand c
      JOIN sh a ON a.doc_id = c.doc_a
      JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
      GROUP BY c.doc_a, c.doc_b
    ),
    ver AS (
      SELECT doc_a, doc_b FROM inter
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE ix * 1.0 / (sa.n + sb.n - ix) >= 0.8
    ),
    und AS (
      SELECT doc_a AS a, doc_b AS b FROM ver
      UNION SELECT doc_b, doc_a FROM ver
    ),
    reach(a, b) AS (
      SELECT a, b FROM und
      UNION
      SELECT r.a, u.b FROM reach r JOIN und u ON u.a = r.b
    ),
    lab AS (
      SELECT a AS doc_id, least(a, min(b)) AS cluster_id
      FROM reach GROUP BY a
    ),
    per AS (
      SELECT lu.cluster_id AS c, count(*) AS d_c,
             sum(CASE WHEN lu.cluster_id = lv.cluster_id
                 THEN 1 ELSE 0 END) AS intra2
      FROM und JOIN lab lu ON lu.doc_id = und.a
               JOIN lab lv ON lv.doc_id = und.b
      GROUP BY lu.cluster_id
    )
    SELECT round(sum(intra2)::DOUBLE / sum(d_c)
                 - sum(d_c::DOUBLE * d_c) / (sum(d_c)::DOUBLE * sum(d_c)),
                 8) AS modularity
    FROM per
    """,
)
def q_modularity(spark, sf_dir):
    """G21 Newman–Girvan modularity of the transitive near-dup cluster
    partition over its verified-pair graph — composes the full dedup
    pipeline, the G5 closure, and the stats.modularity aggregate, all
    replayed in SQL (labels AND quality score pinned cross-engine).
    Components are disjoint, so Q = 1 − Σ(D_c/2m)² — the value checks
    the per-cluster degree-mass distribution, not a constant (≈0.95 on
    the fixtures; a single-cluster partition would be 0).  The general-
    partition formula is NetworkX-golden-tested in
    tests/test_linkgraph_ops.py."""
    from sparkgatha.graph.cc import connected_components
    from sparkgatha.graph.stats import modularity

    d = _t(spark, sf_dir, "documents")
    # ONE pipeline run: the pair graph feeds both the G5 closure (the
    # cluster labels, same composition near_duplicate_clusters wraps)
    # and the modularity aggregate — calling near_duplicate_clusters
    # here would re-run the whole LSH+verify pipeline a second time
    pairs = verified_near_dup_pairs(d)
    e = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"),
        F.lit(1.0).alias("weight"),
    )
    # materialize the (tiny) pair graph once: both the CC supersteps and
    # the modularity joins read it repeatedly
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"),
                 "weight")
    ).localCheckpoint(eager=True)
    labels = connected_components(sym).select(
        "vertex", F.col("component").alias("label")
    )
    return modularity(sym, labels).select(
        F.round("modularity", 8).alias("modularity")
    )


@register(
    "q_dedup_ngram_jaccard",
    f"""
    WITH {_SHINGLES_SQL},
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ix
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           round(ix * 1.0 / (sa.n + sb.n - ix), 4) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE ix * 1.0 / (sa.n + sb.n - ix) >= 0.8
    """,
)
def q_dedup_ngram_jaccard(spark, sf_dir):
    """Exact n-gram Jaccard near-dup pairs (threshold 0.8) via a shingle
    inverted index — the verification stage of the MinHash/LSH pipeline,
    run standalone at oracle scale.  The inverted-index self-join is
    quadratic per shared shingle with no candidate bound, so the input
    is guarded (guard_input_rows) — the composed pipeline
    (q_clean_corpus / near_duplicates) runs this verification on LSH
    candidates only and never hits the guard."""
    from sparkgatha.util import guard_input_rows

    d = _widen(
        guard_input_rows(
            _t(spark, sf_dir, "documents"), "q_dedup_ngram_jaccard"
        )
    )
    sh = d.select("doc_id", F.explode(_shingles()).alias("shingle"))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("ix"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("ix") / (F.col("na") + F.col("nb") - F.col("ix"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(jac >= 0.8)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


def sorted_neighborhood_pairs(
    docs: DataFrame,
    window: int = 8,
    threshold: float = 0.8,
    num_partitions: int | None = None,
    key_len: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sorted-neighborhood near-dup pairs (Hernández & Stolfo, SIGMOD
    1995): sort the corpus by a blocking key (normalized text prefix),
    compare each record only with its ``window`` successors in that
    order, keep pairs with shingle-set Jaccard ≥ ``threshold``.
    Candidate count is O(n·window) — LINEAR, the property the method
    exists for — vs the inverted index's per-shingle quadratic blowup.

    Scale shape — exact global rank WITHOUT a single-partition window
    (the 100 TB funnel the plan-hygiene sweep bans):
    ``repartitionByRange(key, id)`` gives ordered non-overlapping
    ranges; ranks are row_number windows PARTITIONED by the range id
    plus per-range start offsets from a bounded P-row collect (the G13
    driver-scalar class).  The final rank is boundary-independent, so
    range-sampler placement cannot change the output.  Neighbor pairs
    are an equi-join on (rank + off), off ∈ 1..window — no theta join,
    no cartesian."""
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        F.substring(F.lower(F.trim(F.col(text_col))), 1, key_len).alias(
            "key"
        ),
        F.col(text_col).alias("_text"),
    )
    p = num_partitions or d.sparkSession.sparkContext.defaultParallelism
    # materialize the range layout ONCE: the offsets collect and the
    # ranking window must read the SAME boundary placement — the range
    # sampler is not stable across re-evaluations, and offsets from one
    # placement applied to ranks from another corrupt the global rank.
    # r6: the shingle arrays are computed AFTER the range exchange —
    # in the old shape they rode the pre-exchange projection, so the
    # (one-row-group fixture) scan computed every shingle in a single
    # task twice (range-sampling pass + exchange map side); rows and
    # ranks are unchanged, only where the per-row work runs.
    rp = (
        d.repartitionByRange(p, "key", "doc_id")
        .withColumn("_pid", F.spark_partition_id())
        .withColumn("_sh", _shingles("_text"))
        .drop("_text")
        .localCheckpoint(eager=True)
    )
    counts = rp.groupBy("_pid").agg(F.count("*").alias("c")).collect()
    off, offsets = 0, {}
    for row in sorted(counts, key=lambda r: r["_pid"]):
        offsets[row["_pid"]] = off
        off += row["c"]
    off_df = F.broadcast(
        d.sparkSession.createDataFrame(
            list(offsets.items()), "_pid int, _off long"
        )
    )
    w = W.partitionBy("_pid").orderBy("key", "doc_id")
    ranked = (
        rp.withColumn("_lr", F.row_number().over(w))
        .join(off_df, "_pid")
        .select(
            "doc_id", "_sh", (F.col("_off") + F.col("_lr")).alias("r")
        )
        .localCheckpoint(eager=True)  # feeds both sides of the pair join
    )
    a = ranked.select(
        F.col("doc_id").alias("_ida"), F.col("_sh").alias("_sha"),
        F.explode(
            F.sequence(F.col("r") + 1, F.col("r") + window)
        ).alias("_rb"),
    )
    b = ranked.select(
        F.col("doc_id").alias("_idb"), F.col("_sh").alias("_shb"),
        F.col("r").alias("_rb"),
    )
    ix = F.size(F.array_intersect("_sha", "_shb"))
    un = F.size("_sha") + F.size("_shb") - ix
    jac = ix / un
    return (
        a.join(b, "_rb")
        .select(
            F.least("_ida", "_idb").alias("doc_a"),
            F.greatest("_ida", "_idb").alias("doc_b"),
            F.round(jac, 4).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


@register(
    "q_dedup_sorted_neighborhood",
    f"""
    WITH {_SHINGLES_SQL},
    keyed AS (
      SELECT doc_id, substr(lower(trim(text)), 1, 32) AS key
      FROM documents
    ),
    ranked AS (
      SELECT doc_id, row_number() OVER (ORDER BY key, doc_id) AS r
      FROM keyed
    ),
    cand AS (
      SELECT a.doc_id AS ida, b.doc_id AS idb
      FROM ranked a JOIN ranked b ON b.r > a.r AND b.r <= a.r + 8
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT c.ida, c.idb, count(*) AS ix
      FROM cand c
      JOIN sh a ON a.doc_id = c.ida
      JOIN sh b ON b.doc_id = c.idb AND b.shingle = a.shingle
      GROUP BY c.ida, c.idb
    )
    SELECT least(i.ida, i.idb) AS doc_a,
           greatest(i.ida, i.idb) AS doc_b,
           round(ix * 1.0 / (sa.n + sb.n - ix), 4) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.ida
    JOIN sizes sb ON sb.doc_id = i.idb
    WHERE round(ix * 1.0 / (sa.n + sb.n - ix), 4) >= 0.8
    """,
)
def q_dedup_sorted_neighborhood(spark, sf_dir):
    """Sorted-neighborhood dedup (Hernández & Stolfo 1995): normalized-
    prefix blocking key, rank-window-8 candidates (O(n·w), linear),
    shingle-set Jaccard ≥ 0.8 — the linear-candidate counterpart of the
    guarded inverted-index q_dedup_ngram_jaccard.  Value-checked: the
    oracle replays key → global rank → rank-window join → set Jaccard."""
    return sorted_neighborhood_pairs(
        _t(spark, sf_dir, "documents"), window=8, threshold=0.8
    )


@register(
    "q_dedup_simhash",
    f"""
    WITH {_SHINGLES_SQL},
    bits AS (
      SELECT doc_id, b.i AS bit,
             CASE WHEN sum(CASE WHEN
               (((('0x' || substr(md5(shingle), 1, 15))::BIGINT) >> b.i) & 1) = 1
               THEN 1 ELSE -1 END) >= 0 THEN 1 ELSE 0 END AS bitval
      FROM sh, (SELECT unnest(range({SIMHASH_BITS})) AS i) b
      GROUP BY doc_id, b.i
    )
    SELECT doc_id,
           sum(bitval * (1::BIGINT << bit))::BIGINT AS simhash
    FROM bits GROUP BY doc_id
    """,
)
def q_dedup_simhash(spark, sf_dir):
    """SimHash fingerprints (32-bit here; 64 at scale): per-bit majority
    vote over md5-hashed shingles.  Near-dups then group by simhash or by
    hamming-ball probes (simhash_near_dups) — fingerprint computation
    itself is shuffle-free per document."""
    return simhash_fingerprints(_t(spark, sf_dir, "documents"))


def simhash_fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, simhash bigint) — per-bit majority vote over md5-hashed
    shingles (the oracle-checkable explode+groupBy form)."""
    spark = docs.sparkSession
    sh = _widen(docs).select(
        "doc_id", F.explode(_shingles(text_col)).alias("shingle")
    ).withColumn("h", _md5_long(F.col("shingle")))
    bits = spark.range(SIMHASH_BITS).select(F.col("id").cast("int").alias("bit"))
    per_bit = (
        sh.crossJoin(F.broadcast(bits))
        .groupBy("doc_id", "bit")
        .agg(
            F.when(
                F.sum(
                    F.when(F.expr("((h >> bit) & 1) = 1"), 1).otherwise(-1)
                )
                >= 0,
                1,
            )
            .otherwise(0)
            .alias("bitval")
        )
    )
    return per_bit.groupBy("doc_id").agg(
        F.sum(F.expr("cast(bitval as bigint) * (cast(1 as bigint) << bit)")).alias(
            "simhash"
        )
    )


#: hamming-probe block layout for 32-bit simhash at max distance 2:
#: d+1 = 3 blocks — by pigeonhole any pair within hamming distance 2
#: shares at least one block EXACTLY, so candidates come from equi-joins
#: on (block_idx, block_value), never an all-pairs scan
_HAMMING_BLOCKS = ((0, 11), (11, 11), (22, 10))  # (shift, width)
MAX_HAMMING = 2


def simhash_near_dups(
    docs: DataFrame, text_col: str = "text", max_hamming: int = MAX_HAMMING
) -> DataFrame:
    """(doc_a, doc_b, hamming) — near-dup pairs within ``max_hamming``
    bits of simhash, via the blocked probe join (the scale path the
    exact-fingerprint-match form lacked): split the fingerprint into
    d+1 blocks, equi-join per block, verify popcount(xor) on candidates
    only.  The block layout above is sized for max_hamming=2."""
    fps = simhash_fingerprints(docs, text_col)
    blocks = fps.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.expr(
                            f"(simhash >> {shift}) & {(1 << width) - 1}"
                        ).alias("val"),
                    )
                    for i, (shift, width) in enumerate(_HAMMING_BLOCKS)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "simhash", "b.blk", "b.val")
    a = blocks.alias("a")
    b = blocks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sim_a"),
            F.col("b.simhash").alias("sim_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.expr("bit_count(sim_a ^ sim_b)"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", F.col("hamming").cast("int").alias("hamming"))
    )


_SIMHASH_FPS_SQL = f"""
    bits AS (
      SELECT doc_id, b.i AS bit,
             CASE WHEN sum(CASE WHEN
               (((('0x' || substr(md5(shingle), 1, 15))::BIGINT) >> b.i) & 1) = 1
               THEN 1 ELSE -1 END) >= 0 THEN 1 ELSE 0 END AS bitval
      FROM sh, (SELECT unnest(range({SIMHASH_BITS})) AS i) b
      GROUP BY doc_id, b.i
    ),
    fps AS (
      SELECT doc_id,
             sum(bitval * (1::BIGINT << bit))::BIGINT AS simhash
      FROM bits GROUP BY doc_id
    )
"""


@register(
    "q_simhash_hamming",
    f"""
    WITH {_SHINGLES_SQL},
    {_SIMHASH_FPS_SQL},
    blocks AS (
      SELECT doc_id, simhash, b.i AS blk,
             CASE b.i
               WHEN 0 THEN (simhash >> 0) & 2047
               WHEN 1 THEN (simhash >> 11) & 2047
               ELSE (simhash >> 22) & 1023
             END AS val
      FROM fps, (SELECT unnest(range(3)) AS i) b
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.simhash AS sim_a, b.simhash AS sim_b
      FROM blocks a JOIN blocks b
        ON a.blk = b.blk AND a.val = b.val AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, bit_count(xor(sim_a, sim_b))::INTEGER AS hamming
    FROM cand
    WHERE bit_count(xor(sim_a, sim_b)) <= {MAX_HAMMING}
    """,
)
def q_simhash_hamming(spark, sf_dir):
    """SimHash hamming-ball near-dup probe (blocked candidate join +
    popcount verify), end-to-end oracle-checked."""
    return simhash_near_dups(_t(spark, sf_dir, "documents"))


@register(
    "q_dedup_embed_cosine",
    """
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(a.embedding::DOUBLE[],
                                        b.embedding::DOUBLE[]), 4) AS cos
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) > 0.4
    """,
)
def q_dedup_embed_cosine(spark, sf_dir):
    """Embedding-cosine near-dup pairs (>0.4 — fixture max pairwise
    cosine is 0.51, so the production-style 0.95 would be vacuous).
    All-pairs here (oracle scale), so the input is guarded
    (guard_input_rows); the 100 TB path buckets by LSH hyperplane signs
    first (similarity.ann_candidates, per-bucket capped) and joins
    within buckets."""
    from sparkgatha.util import guard_input_rows

    e = guard_input_rows(
        _t(spark, sf_dir, "embeddings"), "q_dedup_embed_cosine"
    ).select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    a = e.alias("a")
    b = e.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    cos = dot / (nrm(F.col("a.v")) * nrm(F.col("b.v")))
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            cos.alias("_cos"),
        )
        .filter(F.col("_cos") > 0.4)
        .select("id_a", "id_b", F.round("_cos", 4).alias("cos"))
    )


@register(
    "q_minhash_lsh_pairs",
    f"""
    WITH {_SHINGLES_SQL},
    {_BANDS_CAND_SQL}
    SELECT doc_a, doc_b FROM cand
    """,
)
def q_minhash_lsh_pairs(spark, sf_dir):
    """LSH-banded near-dup candidates (the 100 TB dedup path) — the
    candidate SET itself is value-checked (md5-derived minhashes are
    engine-independent), not just its downstream verification."""
    return lsh_candidates(_t(spark, sf_dir, "documents"))


def window_hashes(
    docs: DataFrame,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, w): the distinct md5_long hashes of every EXACT run of
    ``k`` consecutive tokens per document — the shared primitive behind
    window-granular substring dedup (shared_window_pairs) and
    train/test decontamination (decontaminate).  A pure array
    expression per row (split -> slice -> concat_ws -> md5), no Python,
    no join: at 100 TB this is one map-side pass emitting len-k+1 longs
    per document."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    toks = ws_tokens(text_col)
    n = F.size(toks)
    idx = F.when(
        n >= k, F.sequence(F.lit(1), n - F.lit(k - 1))
    ).otherwise(F.expr("array()").cast("array<int>"))
    d = _widen(docs).select(F.col(id_col).alias("doc_id"), toks.alias("_toks"),
                            idx.alias("_idx"))
    wins = F.transform(
        F.col("_idx"),
        lambda i: _md5_long(F.concat_ws(" ", F.slice(F.col("_toks"), i, k))),
    )
    return d.select("doc_id", F.explode(wins).alias("w")).distinct()


def shared_window_pairs(
    docs: DataFrame,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    bucket_cap: int = DEFAULT_BUCKET_CAP,
) -> DataFrame:
    """(doc_a < doc_b): document pairs sharing at least one EXACT run of
    ``k`` consecutive tokens — the window-granular form of exact
    substring dedup (the Lee et al. 2022 "Deduplicating Training Data"
    signal at fixed window size): two crawls of the same page, quoted
    passages, or template boilerplate share long verbatim runs even when
    the whole documents differ, which shingle-Jaccard near-dup can miss
    at low overall overlap.

    Scale shape: each document emits len−k+1 window hashes (md5_long of
    the joined tokens — a pure array expression, no Python), distinct
    per doc; pairs come from an equi-join on the window hash with the
    LSH bucket discipline — buckets above ``bucket_cap`` route through
    the bucket-min star (O(size) rows, nothing dropped), so one viral
    boilerplate window can never go quadratic.
    """
    # three lineages consume the window table (counts, join a, join b)
    ws = window_hashes(
        docs, k=k, text_col=text_col, id_col=id_col
    ).localCheckpoint(eager=False)
    counts = ws.groupBy("w").agg(
        F.count("*").alias("c"), F.min("doc_id").alias("m")
    )
    ok = counts.filter((F.col("c") >= 2) & (F.col("c") <= bucket_cap)).select(
        "w"
    )
    inb = ws.join(ok, "w")
    a, b = inb.alias("a"), inb.alias("b")
    pairwise = a.join(
        b,
        (F.col("a.w") == F.col("b.w"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
    over = counts.filter(F.col("c") > bucket_cap).select("w", "m")
    star = (
        ws.join(over, "w")
        .filter(F.col("doc_id") != F.col("m"))
        .select(F.col("m").alias("doc_a"), F.col("doc_id").alias("doc_b"))
    )
    return pairwise.unionByName(star).distinct()


@register(
    "q_window_dup_pairs",
    f"""
    WITH t AS (SELECT doc_id, {{toks}} AS toks FROM documents),
    ws AS (
      SELECT DISTINCT doc_id,
             ('0x' || substr(md5(array_to_string(toks[r.i:r.i + 7], ' ')),
                             1, 15))::BIGINT AS w
      FROM t, unnest(range(1, len(toks) - 6)) AS r(i)
    ),
    cnt AS (SELECT w, count(*) AS c, min(doc_id) AS m FROM ws GROUP BY w),
    ok AS (SELECT w FROM cnt WHERE c BETWEEN 2 AND {DEFAULT_BUCKET_CAP}),
    pw AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM ws a
      JOIN ok ON ok.w = a.w
      JOIN ws b ON b.w = a.w AND b.doc_id > a.doc_id
    ),
    star AS (
      SELECT c.m AS doc_a, ws.doc_id AS doc_b
      FROM ws JOIN cnt c ON c.w = ws.w AND c.c > {DEFAULT_BUCKET_CAP}
      WHERE ws.doc_id <> c.m
    )
    SELECT DISTINCT doc_a, doc_b
    FROM (SELECT * FROM pw UNION ALL SELECT * FROM star)
    """.replace(
        "{toks}",
        "list_filter(string_split_regex(lower(trim(text)), '\\s+'),"
        " x -> x <> '')",
    ),
)
def q_window_dup_pairs(spark, sf_dir):
    """Exact shared-8-token-window pairs (window-granular substring
    dedup) with the LSH bucket-cap star discipline — the pair SET is
    value-checked against DuckDB's identical window-hash join (the
    fixture generator plants near-duplicates, so the check is
    non-vacuous at every sf)."""
    return shared_window_pairs(_t(spark, sf_dir, "documents"), k=8)


def decontaminate(
    corpus: DataFrame,
    eval_docs: DataFrame,
    k: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_eval: bool = True,
) -> DataFrame:
    """Corpus rows whose text shares NO exact run of ``k`` consecutive
    tokens with any evaluation document — the train/test
    decontamination gate (the GPT-3 appendix-C / Lee et al. 2022
    n-gram-overlap rule, default k=13): any training document that
    contains a verbatim eval window is removed before training so the
    benchmark is not memorized.

    Scale shape: the eval set is small by definition, so its distinct
    window hashes broadcast (``broadcast_eval=True``); the corpus side
    is one map-side window_hashes pass -> broadcast semi-join ->
    distinct contaminated ids -> left-anti against the corpus.  No
    shuffle ever carries corpus text, only (doc_id, hash) longs.
    Set ``broadcast_eval=False`` when the eval suite itself is large
    (e.g. decontaminating against another corpus shard); the semi-join
    then sort-merges on the hash.
    """
    ew = (
        window_hashes(eval_docs, k=k, text_col=text_col, id_col=id_col)
        .select("w")
        .distinct()
    )
    if broadcast_eval:
        ew = F.broadcast(ew)
    cw = window_hashes(corpus, k=k, text_col=text_col, id_col=id_col)
    dirty = cw.join(ew, "w", "left_semi").select("doc_id").distinct()
    return corpus.join(
        dirty, corpus[id_col] == dirty.doc_id, "left_anti"
    )


_EVAL_SPLIT_SQL = "substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '4'"


@register(
    "q_decontaminate",
    f"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                         x -> x <> '') AS toks,
             {_EVAL_SPLIT_SQL} AS is_eval
      FROM documents
    ),
    ws AS (
      SELECT DISTINCT doc_id, is_eval,
             ('0x' || substr(md5(array_to_string(toks[r.i:r.i + 7], ' ')),
                             1, 15))::BIGINT AS w
      FROM t, unnest(range(1, len(toks) - 6)) AS r(i)
    ),
    ew AS (SELECT DISTINCT w FROM ws WHERE is_eval),
    dirty AS (
      SELECT DISTINCT doc_id FROM ws
      WHERE NOT is_eval AND w IN (SELECT w FROM ew)
    )
    SELECT doc_id FROM t
    WHERE NOT is_eval AND doc_id NOT IN (SELECT doc_id FROM dirty)
    """,
)
def q_decontaminate(spark, sf_dir):
    """Train/test decontamination: a deterministic md5-split of the
    documents table plays the eval suite (~25%); the remaining corpus
    is filtered to docs sharing no exact 8-token window with it.  The
    fixture generator plants near-duplicates, so dup pairs straddling
    the split make the flagged set non-empty — the surviving doc_id
    SET is value-checked against DuckDB's identical window-hash rule.
    k=8 (not the production default 13) keeps the check non-vacuous on
    fixture-length documents."""
    docs = _t(spark, sf_dir, "documents")
    is_eval = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) < "4"
    return decontaminate(
        docs.filter(~is_eval), docs.filter(is_eval), k=8
    ).select("doc_id")
