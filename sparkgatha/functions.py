"""§2.10 — the vectorized UDF surface (SURVEY.md §2.10, F1–F5).

BASELINE.json mandate: "vectorized pandas/Arrow UDFs (no per-row Python)
throughout".  F3 (mapInPandas) lives in extract.py / multimodal.py; this
module provides the remaining sanctioned shapes, each used by a
registered query so the driver exercises them:

  F1  scalar pandas UDF           — normalize_text (vectorized pandas str ops)
  F2  iterator-of-series UDF      — token_count_preloaded (heavy state
      initialized once per Python worker, the reference's
      dask_process_global worker-preloader pattern)
  F4  applyInPandas grouped map   — per-group z-score (vectorized numpy)
  F5  grouped-agg pandas UDF      — weighted mean

Rule of thumb (SURVEY.md F1): prefer a built-in when one exists — these
exist for the cases where the Python stage is genuinely needed (model
vocab, numpy kernels), and each query here ALSO has a pure-SQL oracle so
the Arrow path is correctness-checked end-to-end.

UDF objects are built lazily (pandas_udf parses its DDL return type
against the active session, so decoration at import time would require a
SparkContext).
"""

from __future__ import annotations

from collections.abc import Iterator
from functools import lru_cache

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from sparkgatha.relational import _t, register


@lru_cache(maxsize=None)
def normalize_text_udf():
    """F1 scalar pandas UDF: lowercase + collapse whitespace — vectorized
    pandas string kernel (ref analog: per-partition text normalization in
    agatha/construct/text_util.py per SURVEY.md F1)."""

    @F.pandas_udf("string")
    def normalize_text(s: pd.Series) -> pd.Series:
        return s.str.lower().str.strip().str.replace(r"\s+", " ", regex=True)

    return normalize_text


@lru_cache(maxsize=None)
def token_count_udf():
    """F2 iterator-of-series UDF: stopword set + compiled regex built
    ONCE before the batch loop — the reference's worker-preloader pattern
    (agatha/construct/dask_process_global.py per SURVEY.md F2): heavy
    state (models, vocabularies) loads per Python worker, not per batch."""

    @F.pandas_udf("int")
    def token_count(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        import re

        # heavy init ONCE per worker, before the batch loop
        tok_re = re.compile(r"\S+")
        # a stopword token = stopword preceded by start/whitespace and
        # followed by whitespace/end; the lookahead keeps consecutive
        # stopwords ("a a a") all matching
        stop_re = re.compile(r"(?:^|\s)(?:a|the)(?=\s|$)")
        for s in it:
            low = s.str.strip().str.lower()
            n = low.str.count(tok_re) - low.str.count(stop_re)
            yield n.fillna(0).astype("int32")

    return token_count


@lru_cache(maxsize=None)
def weighted_mean_udf():
    """F5 grouped-agg pandas UDF."""

    @F.pandas_udf("double")
    def weighted_mean(v: pd.Series, w: pd.Series) -> float:
        ws = w.to_numpy(dtype=np.float64)
        s = ws.sum()
        return float((v.to_numpy(dtype=np.float64) * ws).sum() / s) if s else 0.0

    return weighted_mean


def _zscore(pdf: pd.DataFrame) -> pd.DataFrame:
    v = pdf["value"].to_numpy(dtype=np.float64)
    mu = v.mean()
    sd = v.std(ddof=0)
    z = (v - mu) / sd if sd > 0 else np.zeros_like(v)
    return pd.DataFrame(
        {"event_id": pdf["event_id"], "user_id": pdf["user_id"],
         "z": np.round(z, 4)}
    )


@register(
    "q_udf_normalize",
    """
    SELECT doc_id,
           md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS norm_md5
    FROM documents
    """,
)
def q_udf_normalize(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.md5(normalize_text_udf()("text")).alias("norm_md5")
    )


@register(
    "q_udf_token_count",
    """
    SELECT doc_id,
           len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                           x -> x <> '' AND x NOT IN ('a','the')))::INTEGER
             AS n_tokens
    FROM documents
    """,
)
def q_udf_token_count(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", token_count_udf()("text").alias("n_tokens")
    )


@register(
    "q_udf_group_zscore",
    """
    SELECT event_id, user_id,
           round(CASE WHEN stddev_pop(value) OVER w = 0 THEN 0
                 ELSE (value - avg(value) OVER w) / (stddev_pop(value) OVER w)
                 END, 4) AS z
    FROM events
    WINDOW w AS (PARTITION BY user_id)
    """,
)
def q_udf_group_zscore(spark, sf_dir):
    """F4 grouped-map: per-user z-score via a numpy kernel (ref analog:
    Dask map_partitions per-group fits, SURVEY.md F4) — oracle is the
    equivalent window-function SQL, so the Arrow grouped-map path is
    value-checked against a pure-JVM formulation."""
    e = _t(spark, sf_dir, "events")
    return e.select("event_id", "user_id", "value").groupBy(
        "user_id"
    ).applyInPandas(_zscore, schema="event_id long, user_id long, z double")


@register(
    "q_udf_weighted_mean",
    """
    SELECT l_returnflag,
           round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4)
             AS wmean_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_udf_weighted_mean(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(
            weighted_mean_udf()("l_extendedprice", "l_quantity"), 4
        ).alias("wmean_price")
    )


@lru_cache(maxsize=None)
def split_terms_udtf():
    """F6 Python UDTF (Spark 4 ``udtf``): one input row → one output row
    per whitespace token, with its 1-based position.

    This closes the last §2.10 surface.  It is deliberately NOT the
    production exploder — row-at-a-time ``eval`` is the UDTF contract, so
    the hot path stays F3 ``mapInPandas`` (extract.py, batch-vectorized
    numpy); the UDTF exists for the lateral-join query shape the
    reference's per-record generators map to (SURVEY.md §2.10 F6)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="term string, pos int")
    class SplitTerms:
        def eval(self, text: str):
            import re

            for i, t in enumerate(re.split(r"\s+", (text or "").strip().lower())):
                yield t, i + 1

    return SplitTerms


@register(
    "q_udtf_split_terms",
    """
    WITH s AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS l
      FROM documents
    )
    SELECT s.doc_id, s.l[CAST(g.i AS INT)] AS term, CAST(g.i AS INT) AS pos
    FROM s, unnest(generate_series(1, len(s.l))) AS g(i)
    """,
)
def q_udtf_split_terms(spark, sf_dir):
    """F6 UDTF exercised through a LATERAL join, value-checked against
    the DuckDB list-unnest equivalent."""
    d = _t(spark, sf_dir, "documents")
    spark.udtf.register("split_terms", split_terms_udtf())
    d.select("doc_id", "text").createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        "SELECT d.doc_id, s.term, s.pos "
        "FROM _udtf_docs d, LATERAL split_terms(d.text) s"
    )
