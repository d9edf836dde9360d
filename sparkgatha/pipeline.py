"""Composed corpus-curation pipeline — the operator chain a 100 TB
training-data user actually calls (task brief: dedup / quality / text
analysis as first-class components; SURVEY.md §2 extras).

``clean_corpus`` = quality gates (textan) → exact dedup keep-min →
near-dup removal (LSH-banded, verified — dedup.near_duplicates), each
stage a partial-aggregable groupBy or a bucketed equi-join: no
all-pairs work anywhere, so the composition inherits the scale story of
its parts.  Reference analog: AGATHA filters short/low-quality
sentences and dedups by hashed key before graph construction
(agatha/construct/text_util.py — SURVEY.md §2.2 P2/P3); this is that
phase generalized to corpus curation.

The registered query replays the WHOLE composition in DuckDB SQL —
quality CTE, md5 keep-min, LSH banding, Jaccard verify, anti-join — so
the pipeline is value-checked end-to-end, not just its stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from sparkgatha.dedup import (
    DEFAULT_BUCKET_CAP,
    _BANDS_CAND_SQL,
    _SHINGLES_SQL,
    near_duplicates,
)
from sparkgatha.relational import _t, register
from sparkgatha.textan import _TOKS
from sparkgatha.util import ws_tokens


def quality_survivors(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Documents passing the textan quality gates (same rules as
    q_quality_score: ≥10 tokens, avg token length in [2, 12])."""
    toks = ws_tokens(text_col)
    n_tok = F.size(toks)
    avg_len = F.length(text_col) / F.greatest(n_tok, F.lit(1))
    return docs.withColumn("n_tok", n_tok).filter(
        (n_tok >= 10) & avg_len.between(2, 12)
    )


def exact_dedup_keep_min(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One row per distinct text: the smallest id wins (single
    hash-groupBy on the digest — shuffles once, 100 TB safe)."""
    keep = (
        docs.groupBy(F.md5(F.col(text_col)).alias("_digest"))
        .agg(F.min(id_col).alias(id_col))
        .drop("_digest")
    )
    return docs.join(keep, id_col, "left_semi")


def clean_corpus(
    docs: DataFrame,
    text_col: str = "text",
    threshold: float = 0.8,
    bucket_cap: int = DEFAULT_BUCKET_CAP,
) -> DataFrame:
    """Quality gates → exact dedup keep-min → near-dup removal.

    Returns the surviving documents (original columns + ``n_tok``).
    Stage order matters and is part of the contract: near-dup search
    runs on the already-quality-filtered, exactly-deduped set, so its
    LSH join sees the smallest candidate universe.
    """
    q = quality_survivors(docs, text_col)
    # the filtered+exact-deduped set feeds the whole near-dup pipeline
    # AND the final anti-join — materialize its lineage once instead of
    # re-running quality gate + digest dedup under every branch
    ex = exact_dedup_keep_min(q, text_col).localCheckpoint(eager=False)
    dups = near_duplicates(ex, text_col, threshold, bucket_cap).select(
        F.col("dup_doc_id").alias("doc_id")
    )
    return ex.join(dups, "doc_id", "left_anti")


_QUALITY_SQL = f"""
  qstats AS (
    SELECT doc_id, len({_TOKS}) AS n_tok, length(text) AS n_chr
    FROM documents
  ),
  q AS (
    SELECT doc_id, n_tok FROM qstats
    WHERE n_tok >= 10
      AND n_chr * 1.0 / greatest(n_tok, 1) BETWEEN 2 AND 12
  ),
  ex AS (
    SELECT min(d.doc_id) AS doc_id
    FROM documents d JOIN q USING (doc_id)
    GROUP BY md5(d.text)
  ),
  docs_f AS (
    SELECT d.doc_id, d.lang, d.text, q.n_tok
    FROM documents d JOIN ex USING (doc_id) JOIN q USING (doc_id)
  )
"""

# the near-dup replay from dedup.q_near_duplicates (shared band/candidate
# CTE chain, incl. the over-cap star fallback), re-pointed at docs_f
_NEARDUP_SQL = (
    _SHINGLES_SQL.replace("FROM documents", "FROM docs_f")
    + f""",
  sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
  {_BANDS_CAND_SQL},
  inter AS (
    SELECT c.doc_a, c.doc_b, count(*) AS ix
    FROM cand c
    JOIN sh a ON a.doc_id = c.doc_a
    JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
    GROUP BY c.doc_a, c.doc_b
  ),
  dups AS (
    SELECT DISTINCT doc_b AS doc_id
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE ix * 1.0 / (sa.n + sb.n - ix) >= 0.8
  )
"""
)


@register(
    "q_clean_corpus",
    f"""
    WITH {_QUALITY_SQL},
    {_NEARDUP_SQL}
    SELECT doc_id, lang, CAST(n_tok AS INTEGER) AS n_tok
    FROM docs_f
    WHERE doc_id NOT IN (SELECT doc_id FROM dups)
    """,
)
def q_clean_corpus(spark, sf_dir):
    """The full curation composition, value-checked end-to-end against a
    pure-SQL replay of every stage."""
    d = _t(spark, sf_dir, "documents")
    return clean_corpus(d).select("doc_id", "lang", "n_tok")


def stratified_sample(
    df: DataFrame,
    group_col: str,
    n_per_group: int,
    key_col: str,
) -> DataFrame:
    """Deterministic per-group quota sample: each group keeps its
    ``n_per_group`` rows with the smallest (md5(key), key) — the
    per-language / per-domain downsampling pass a 100 TB curation
    pipeline runs to rebalance a skewed corpus before training.

    The rank rule is the engine-independent md5 trick q_sample_hash
    pins (reproducible across engines, partitionings, and retries —
    the property training-data splits need), but quota'd per group
    instead of a global rate, so a 90 %-English crawl can be capped at
    N docs per language without starving the tail languages.

    One shuffle on ``group_col``; the window is partitioned (never a
    single-partition global sort), and at corpus scale a hot group is
    bounded by the same skew story every partitioned window here has —
    rows stream through the rank and stop counting past the quota.
    """
    if n_per_group < 1:
        raise ValueError(f"n_per_group must be >= 1, got {n_per_group}")
    from pyspark.sql import Window

    rk = F.md5(F.col(key_col).cast("string"))
    w = Window.partitionBy(group_col).orderBy(rk.asc(), F.col(key_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_group)
        .drop("_rn")
    )


@register(
    "q_sample_stratified",
    """
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS rn
      FROM documents
    ) WHERE rn <= 5
    """,
)
def q_sample_stratified(spark, sf_dir):
    """P4, per-group variant: deterministic per-language quota sample
    (5 docs/lang by smallest md5 rank) — value-checked as a SET against
    DuckDB's identical window rule.  The quota binds at every sf (each
    fixture language holds >5 docs), so the check is never vacuous."""
    d = _t(spark, sf_dir, "documents")
    return stratified_sample(
        d, group_col="lang", n_per_group=5, key_col="doc_id"
    ).select("doc_id", "lang")


def mixture_weights(
    df: DataFrame,
    group_col: str,
    alpha: float = 0.3,
) -> DataFrame:
    """(group, n_docs, p, w, boost): temperature-scaled sampling
    mixture over a grouping column — the multilingual-rebalance rule
    (mC4 / PaLM / XLM-R all train on p_l^α renormalized shares,
    α≈0.3): raw share p = n_g/N, sampling weight w = p^α / Σ_g p^α,
    boost = w/p (the expected per-document repeat factor a sampler
    applies — >1 upweights tail groups, <1 downweights the head).

    Scale shape: ONE partial-aggregable groupBy to the per-group
    counts (a table the size of the number of languages/domains —
    trivially broadcastable), then the two scalars (total mass,
    Σ p^α) ride a 1-row broadcast crossJoin.  The corpus is read
    once; no window, no Python.
    """
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    counts = (
        df.groupBy(group_col)
        .agg(F.count("*").alias("n_docs"))
        .localCheckpoint(eager=False)  # feeds the scalar AND the output
    )
    a = F.lit(float(alpha))
    scalars = F.broadcast(
        counts.agg(
            F.sum("n_docs").alias("_total"),
            # Σ (n_g/N)^α = (Σ n_g^α) / N^α — one pass, no self-join
            F.sum(F.pow(F.col("n_docs").cast("double"), a)).alias("_pow_sum"),
        )
    )
    p = F.col("n_docs").cast("double") / F.col("_total")
    w = (
        F.pow(F.col("n_docs").cast("double"), a)
        / F.col("_pow_sum")
    )
    return counts.crossJoin(scalars).select(
        group_col,
        "n_docs",
        p.alias("p"),
        w.alias("w"),
        (w / p).alias("boost"),
    )


@register(
    "q_mixture_weights",
    """
    WITH c AS (
      SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang
    ),
    sc AS (
      SELECT sum(n_docs) AS total,
             sum(pow(CAST(n_docs AS DOUBLE), 0.3)) AS pow_sum
      FROM c
    )
    SELECT lang, n_docs,
           round(CAST(n_docs AS DOUBLE) / sc.total, 8) AS p,
           round(pow(CAST(n_docs AS DOUBLE), 0.3) / sc.pow_sum, 8) AS w,
           round((pow(CAST(n_docs AS DOUBLE), 0.3) / sc.pow_sum)
                 / (CAST(n_docs AS DOUBLE) / sc.total), 8) AS boost
    FROM c CROSS JOIN sc
    """,
)
def q_mixture_weights(spark, sf_dir):
    """Temperature-α=0.3 language-mixture weights over the fixture
    corpus: per-language share, renormalized sampling weight, and the
    per-document boost factor — identical double expressions both
    engines, rounded to 8 decimals."""
    d = _t(spark, sf_dir, "documents")
    out = mixture_weights(d, "lang", alpha=0.3)
    return out.select(
        "lang",
        "n_docs",
        F.round("p", 8).alias("p"),
        F.round("w", 8).alias("w"),
        F.round("boost", 8).alias("boost"),
    )
