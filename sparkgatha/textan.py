"""Text-analysis suite over ``documents`` — language-ID heuristic,
quality scoring, token counting, document fingerprinting (task brief:
training-data pipeline operators, graded alongside SURVEY.md §2).

Reference analog: AGATHA's text_util phase computes per-sentence token
stats and filters short/low-quality sentences before graph construction
(agatha/construct/text_util.py — SURVEY.md §2.2 P2); these operators are
the same shape re-pointed at corpus curation.  Everything is JVM-side
expression work (whole-stage codegen); no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkgatha.relational import _t, register
from sparkgatha.util import ws_tokens

# tiny per-language stopword markers for the n-gram/stopword heuristic
LANG_MARKERS = {
    "en": ["the", "a", "of", "and", "to"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
    "es": ["el", "la", "los", "y", "es"],
}

# the DuckDB mirror of util.ws_tokens — change BOTH together or every
# text oracle drifts from the Spark side
_TOKS = "list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '')"


# BPE-ish pre-tokenizer (the GPT-2 regex shape reduced to its
# dialect-portable core): letter runs | digit runs | punctuation runs.
# Whitespace is the EXPLICIT class [ \t\n\r\f] — Java regex \s includes
# \x0B (vertical tab) while RE2's does not, so \s itself is NOT
# dialect-portable; an explicit class is identical in both engines.
_BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r\f]+"


@register(
    "q_token_count",
    f"""
    SELECT doc_id,
           len({_TOKS}) AS n_tokens,
           len(list_distinct({_TOKS})) AS n_unique,
           len(regexp_extract_all(text, '{_BPE_RE}')) AS n_bpe_tokens,
           length(text) AS n_bytes
    FROM documents
    """,
)
def q_token_count(spark, sf_dir):
    """Whitespace token counts + a BPE-ish pre-tokenizer count (letter /
    digit / punctuation runs — the train-data cost estimator shape); all
    whole-stage-codegen JVM expressions."""
    d = _t(spark, sf_dir, "documents")
    toks = ws_tokens("text")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique"),
        F.regexp_count("text", F.lit(_BPE_RE)).alias("n_bpe_tokens"),
        F.length("text").alias("n_bytes"),
    )


@register(
    "q_lang_id",
    f"""
    WITH scored AS (
      SELECT doc_id,
             len(list_filter({_TOKS}, x -> x IN ('the','a','of','and','to')))  AS s_en,
             len(list_filter({_TOKS}, x -> x IN ('der','die','das','und','ist'))) AS s_de,
             len(list_filter({_TOKS}, x -> x IN ('le','la','les','et','est')))  AS s_fr,
             len(list_filter({_TOKS}, x -> x IN ('el','la','los','y','es')))   AS s_es
      FROM documents
    )
    SELECT doc_id,
           CASE WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
                WHEN s_en >= greatest(s_de, s_fr, s_es) THEN 'en'
                WHEN s_de >= greatest(s_fr, s_es) THEN 'de'
                WHEN s_fr >= s_es THEN 'fr'
                ELSE 'es' END AS pred_lang
    FROM scored
    """,
)
def q_lang_id(spark, sf_dir):
    """Stopword-marker language ID (n-gram heuristic family): score each
    language by marker-token hits, deterministic priority tie-break."""
    d = _t(spark, sf_dir, "documents")
    toks = ws_tokens("text")
    scores = {
        lang: F.size(F.filter(toks, lambda t: t.isin(*markers)))
        for lang, markers in LANG_MARKERS.items()
    }
    s_en, s_de, s_fr, s_es = (scores[x] for x in ("en", "de", "fr", "es"))
    pred = (
        F.when(F.greatest(s_en, s_de, s_fr, s_es) == 0, "und")
        .when(s_en >= F.greatest(s_de, s_fr, s_es), "en")
        .when(s_de >= F.greatest(s_fr, s_es), "de")
        .when(s_fr >= s_es, "fr")
        .otherwise("es")
    )
    return d.select("doc_id", pred.alias("pred_lang"))


@register(
    "q_quality_score",
    f"""
    WITH stats AS (
      SELECT doc_id,
             len({_TOKS}) AS n_tok,
             length(text) AS n_chr,
             len(list_filter({_TOKS}, x -> x IN ('a','the'))) AS n_stop
      FROM documents
    )
    SELECT doc_id, n_tok,
           round(n_chr * 1.0 / greatest(n_tok, 1), 4) AS avg_tok_len,
           round(n_stop * 1.0 / greatest(n_tok, 1), 4) AS stop_ratio,
           CASE WHEN n_tok >= 10 AND n_chr * 1.0 / greatest(n_tok, 1) BETWEEN 2 AND 12
                THEN 1 ELSE 0 END AS quality_ok
    FROM stats
    """,
)
def q_quality_score(spark, sf_dir):
    """Quality scoring: length / avg-token-length / stopword-ratio gates
    (the reference's min-length sentence filter, generalized)."""
    d = _t(spark, sf_dir, "documents")
    toks = ws_tokens("text")
    n_tok = F.size(toks)
    n_chr = F.length("text")
    n_stop = F.size(F.filter(toks, lambda t: t.isin("a", "the")))
    avg_len = n_chr / F.greatest(n_tok, F.lit(1))
    return d.select(
        "doc_id",
        n_tok.alias("n_tok"),
        F.round(avg_len, 4).alias("avg_tok_len"),
        F.round(n_stop / F.greatest(n_tok, F.lit(1)), 4).alias("stop_ratio"),
        F.when((n_tok >= 10) & avg_len.between(2, 12), 1)
        .otherwise(0)
        .alias("quality_ok"),
    )


@register(
    "q_fingerprint",
    """
    SELECT doc_id,
           md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
    FROM documents
    """,
)
def q_fingerprint(spark, sf_dir):
    """Document fingerprint: md5 over whitespace-normalized lowercase
    text (rolling-hash family; md5 keeps it cross-engine-checkable)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")).alias(
            "fp"
        ),
    )


@register(
    "q_top_ngrams",
    f"""
    WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    bi AS (
      SELECT unnest(list_transform(range(1, len(toks)),
                                   i -> toks[i] || ' ' || toks[i + 1])) AS ngram
      FROM tok WHERE len(toks) >= 2
    )
    SELECT ngram, count(*) AS n FROM bi
    GROUP BY ngram ORDER BY n DESC, ngram ASC LIMIT 20
    """,
)
def q_top_ngrams(spark, sf_dir):
    """Vocabulary building: corpus-wide bigram counts, top-20 with a
    deterministic tie-break — the n-gram phase of the reference
    (frequent-n-gram mining before graph construction, SURVEY.md §3.1
    phase DAG) as a two-shuffle groupBy + TakeOrderedAndProject."""
    d = _t(spark, sf_dir, "documents")
    toks = ws_tokens("text")
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    )
    return (
        d.select(F.explode(bigrams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("ngram").asc())
        .limit(20)
    )


def repetition_signals(docs, text_col: str = "text", id_col: str = "doc_id"):
    """(id, rep_token_frac, top_bigram_frac) — the Gopher-style
    within-document repetition profile (Rae et al. 2021 §A1.1 adapted to
    token granularity): the fraction of tokens that are repeats of an
    earlier token, and the mass of the single most frequent bigram among
    all bigrams.  High values flag boilerplate / keyword-stuffed / looping
    documents the quality gate should drop before training.

    Scale shape: rep_token_frac is a pure array expression (codegen);
    the bigram mode goes through explode → partial-aggregable
    groupBy(id, bigram) → groupBy(id) max/sum — never an O(len²)
    per-row expression, so a 10k-token document costs 10k rows, not
    10^8 comparisons."""
    toks = ws_tokens(text_col)
    n = F.size(toks)
    nu = F.size(F.array_distinct(toks))
    base = docs.select(
        id_col,
        F.when(n == 0, F.lit(0.0))
        .otherwise(F.lit(1.0) - nu.cast("double") / n)
        .alias("rep_token_frac"),
        toks.alias("_toks"),
    )
    bg = F.zip_with(
        F.expr("slice(_toks, 1, greatest(size(_toks) - 1, 0))"),
        F.expr("slice(_toks, 2, greatest(size(_toks) - 1, 0))"),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    bc = (
        base.select(id_col, F.explode(bg).alias("b"))
        .groupBy(id_col, "b")
        .agg(F.count("*").alias("c"))
    )
    bs = bc.groupBy(id_col).agg(
        (F.max("c").cast("double") / F.sum("c")).alias("top_bigram_frac")
    )
    return base.join(bs, id_col, "left").select(
        id_col,
        "rep_token_frac",
        F.coalesce("top_bigram_frac", F.lit(0.0)).alias("top_bigram_frac"),
    )


@register(
    "q_repetition_signals",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    base AS (
      SELECT doc_id, len(toks) AS n, len(list_distinct(toks)) AS nu
      FROM t
    ),
    bg AS (
      SELECT doc_id, toks[r.i] || ' ' || toks[r.i + 1] AS b
      FROM t, unnest(range(1, len(toks))) AS r(i)
    ),
    bc AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY doc_id, b),
    bs AS (
      SELECT doc_id, max(c) * 1.0 / sum(c) AS top_bigram_frac
      FROM bc GROUP BY doc_id
    )
    SELECT base.doc_id,
           round(CASE WHEN n = 0 THEN 0.0
                      ELSE 1.0 - nu * 1.0 / n END, 8) AS rep_token_frac,
           round(coalesce(bs.top_bigram_frac, 0.0), 8) AS top_bigram_frac
    FROM base LEFT JOIN bs ON bs.doc_id = base.doc_id
    """,
)
def q_repetition_signals(spark, sf_dir):
    """Gopher-style repetition profile per document (repeated-token
    fraction + top-bigram mass) — the boilerplate/looping-text signal a
    curation gate thresholds; value-checked against DuckDB's identical
    token/bigram expressions."""
    d = _t(spark, sf_dir, "documents")
    out = repetition_signals(d)
    return out.select(
        "doc_id",
        F.round("rep_token_frac", 8).alias("rep_token_frac"),
        F.round("top_bigram_frac", 8).alias("top_bigram_frac"),
    )


def importance_weights(
    corpus,
    target,
    text_col: str = "text",
    id_col: str = "doc_id",
    smoothing: float = 1.0,
):
    """(id, n_tokens, log_ratio): per-document average token
    log-likelihood ratio  (1/n)·Σ_t [ln p_target(t) − ln p_corpus(t)]
    under add-k-smoothed unigram LMs — the Data Selection with
    Importance Resampling score (Xie et al. 2023, DSIR) at unigram
    granularity: documents that look more like the target distribution
    than the raw crawl score high and survive resampling.

    Scale shape: both LMs are partial-aggregable token groupBys; the
    three scalars (corpus mass, target mass, shared vocab size) ride a
    1-row broadcast crossJoin (the G4 dangling-mass pattern); scoring
    is explode → two vocabulary-sized equi-joins → partial-agg sum per
    doc.  No window, no Python, no driver collect — at 100 TB the only
    wide tables are (token, count) vocabularies, orders of magnitude
    smaller than the corpus.
    """
    if smoothing <= 0:
        raise ValueError(f"smoothing must be > 0, got {smoothing}")
    toks = ws_tokens(text_col)
    ct = corpus.select(F.col(id_col).alias("_id"), F.explode(toks).alias("t"))
    tt = target.select(F.explode(toks).alias("t"))
    # each LM feeds three lineages (score join, mass scalar, union vocab);
    # without a barrier every consumer re-tokenizes the full corpus
    corpus_lm = (
        ct.groupBy("t").agg(F.count("*").alias("cc"))
        .localCheckpoint(eager=False)
    )
    target_lm = (
        tt.groupBy("t").agg(F.count("*").alias("tc"))
        .localCheckpoint(eager=False)
    )
    # scalars: total masses + the UNION vocabulary the smoothing is over
    vocab = corpus_lm.select("t").unionByName(target_lm.select("t")).distinct()
    # scalar names must not collide case-insensitively with tc/cc
    scalars = F.broadcast(
        corpus_lm.agg(F.sum("cc").alias("corpus_mass"))
        .crossJoin(target_lm.agg(F.sum("tc").alias("target_mass")))
        .crossJoin(vocab.agg(F.count("*").alias("vocab_n")))
    )
    a = F.lit(float(smoothing))
    scored = (
        ct.join(corpus_lm, "t")
        .join(target_lm, "t", "left")
        .crossJoin(scalars)
        .select(
            "_id",
            (
                F.log((F.coalesce(F.col("tc"), F.lit(0)) + a)
                      / (F.col("target_mass") + a * F.col("vocab_n")))
                - F.log((F.col("cc") + a)
                        / (F.col("corpus_mass") + a * F.col("vocab_n")))
            ).alias("lr"),
        )
    )
    return scored.groupBy("_id").agg(
        F.count("*").alias("n_tokens"),
        (F.sum("lr") / F.count("*")).alias("log_ratio"),
    ).select(F.col("_id").alias(id_col), "n_tokens", "log_ratio")


_TARGET_SQL = "source IN ('src1', 'src2', 'src3')"


@register(
    "q_importance_weights",
    f"""
    WITH ct AS (
      SELECT doc_id, unnest({_TOKS}) AS t FROM documents
      WHERE NOT ({_TARGET_SQL})
    ),
    tt AS (
      SELECT unnest({_TOKS}) AS t FROM documents WHERE {_TARGET_SQL}
    ),
    clm AS (SELECT t, count(*) AS cc FROM ct GROUP BY t),
    tlm AS (SELECT t, count(*) AS tc FROM tt GROUP BY t),
    sc AS (
      SELECT (SELECT sum(cc) FROM clm) AS Tc,
             (SELECT sum(tc) FROM tlm) AS Tt,
             (SELECT count(*) FROM
                (SELECT t FROM clm UNION SELECT t FROM tlm)) AS V
    )
    SELECT ct.doc_id,
           count(*) AS n_tokens,
           round(sum(  ln((coalesce(tlm.tc, 0) + 1.0) / (sc.Tt + sc.V))
                     - ln((clm.cc + 1.0) / (sc.Tc + sc.V)))
                 / count(*), 8) AS log_ratio
    FROM ct
    JOIN clm ON clm.t = ct.t
    LEFT JOIN tlm ON tlm.t = ct.t
    CROSS JOIN sc
    GROUP BY ct.doc_id
    """,
)
def q_importance_weights(spark, sf_dir):
    """DSIR-style data-selection scores: three fixture sources play the
    target distribution; every other document gets its add-1-smoothed
    unigram log-likelihood ratio (identical double expression both
    engines, rounded to 8 decimals)."""
    d = _t(spark, sf_dir, "documents")
    is_target = F.col("source").isin("src1", "src2", "src3")
    out = importance_weights(d.filter(~is_target), d.filter(is_target))
    return out.select(
        "doc_id", "n_tokens", F.round("log_ratio", 8).alias("log_ratio")
    )


def lm_perplexity(
    corpus,
    train,
    text_col: str = "text",
    id_col: str = "doc_id",
    smoothing: float = 1.0,
):
    """(id, n_tokens, ln_ppl): per-document cross-entropy under an
    add-k-smoothed unigram LM trained on ``train`` — the CCNet quality
    filter (Wenzek et al. 2020) at unigram granularity: a reference LM
    is fit on a trusted slice and every crawl document is scored by how
    surprising it looks; low perplexity = head quality.  DSIR's
    ``importance_weights`` ranks by a RATIO of two LMs (target vs raw
    crawl); this is the single-LM absolute score the CCNet bucketing
    step consumes.

    p(t) = (c(t)+a) / (T + a·(V+1)) with V = train vocab size and one
    shared OOV bucket (unseen tokens score c=0); ln_ppl =
    −(1/n)·Σ_t ln p(t).

    Scale shape: the LM is one partial-aggregable token groupBy
    (vocabulary-sized, orders of magnitude smaller than the corpus);
    its two scalars (mass T, vocab V) ride a 1-row broadcast crossJoin
    (the G4 dangling-mass pattern); scoring is explode → one
    vocabulary-sized LEFT equi-join → partial-agg sum per doc.  No
    window, no Python, no driver collect.
    """
    if smoothing <= 0:
        raise ValueError(f"smoothing must be > 0, got {smoothing}")
    toks = ws_tokens(text_col)
    ct = corpus.select(F.col(id_col).alias("_id"), F.explode(toks).alias("t"))
    tt = train.select(F.explode(toks).alias("t"))
    # the LM feeds two lineages (score join + scalar mass/vocab row);
    # the barrier keeps the train slice tokenized once
    lm = tt.groupBy("t").agg(F.count("*").alias("c")).localCheckpoint(
        eager=False
    )
    scalars = F.broadcast(
        lm.agg(
            F.sum("c").alias("train_mass"), F.count("*").alias("vocab_n")
        ).select(
            # an empty train slice would otherwise make every ln_ppl a
            # silent NULL (ln(x/NULL)); the module convention is to
            # raise loudly, and this in-plan guard keeps the pipeline
            # fully lazy — no extra driver job on the happy path
            F.when(F.col("vocab_n") > 0, F.col("train_mass"))
            .otherwise(
                F.raise_error(
                    "lm_perplexity: train slice tokenizes to zero "
                    "tokens — cannot fit a reference LM"
                ).cast("bigint")
            )
            .alias("train_mass"),
            "vocab_n",
        )
    )
    a = F.lit(float(smoothing))
    scored = (
        ct.join(lm, "t", "left")
        .crossJoin(scalars)
        .select(
            "_id",
            F.log(
                (F.coalesce(F.col("c"), F.lit(0)) + a)
                / (F.col("train_mass") + a * (F.col("vocab_n") + 1))
            ).alias("lp"),
        )
    )
    return scored.groupBy("_id").agg(
        F.count("*").alias("n_tokens"),
        (-F.sum("lp") / F.count("*")).alias("ln_ppl"),
    ).select(F.col("_id").alias(id_col), "n_tokens", "ln_ppl")


@register(
    "q_lm_perplexity",
    f"""
    WITH tt AS (
      SELECT unnest({_TOKS}) AS t FROM documents WHERE {_TARGET_SQL}
    ),
    lm AS (SELECT t, count(*) AS c FROM tt GROUP BY t),
    sc AS (
      SELECT sum(c) AS T, count(*) AS V FROM lm
    ),
    ct AS (
      SELECT doc_id, unnest({_TOKS}) AS t FROM documents
    ),
    scored AS (
      SELECT ct.doc_id,
             count(*) AS n_tokens,
             round(-sum(ln((coalesce(lm.c, 0) + 1.0) / (sc.T + sc.V + 1)))
                   / count(*), 8) AS ln_ppl
      FROM ct
      LEFT JOIN lm ON lm.t = ct.t
      CROSS JOIN sc
      GROUP BY ct.doc_id
    ),
    thr AS (
      SELECT round(quantile_cont(ln_ppl, 1.0/3), 4) AS t1,
             round(quantile_cont(ln_ppl, 2.0/3), 4) AS t2
      FROM scored
    )
    SELECT doc_id, n_tokens, ln_ppl,
           CASE WHEN ln_ppl <= thr.t1 THEN 'head'
                WHEN ln_ppl <= thr.t2 THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM scored CROSS JOIN thr
    """,
)
def q_lm_perplexity(spark, sf_dir):
    """CCNet-style quality bucketing: the three target fixture sources
    train the reference unigram LM; every document gets its smoothed
    ln-perplexity (rounded 8) and a head/middle/tail bucket at the
    corpus terciles.  The tercile thresholds are exact interpolated
    percentiles over ALREADY-ROUNDED scores (identical inputs both
    engines), themselves rounded to 4 decimals before the comparison so
    the bucket rule is engine-stable; they ride a 1-row broadcast
    crossJoin, never a global sort."""
    d = _t(spark, sf_dir, "documents")
    is_target = F.col("source").isin("src1", "src2", "src3")
    scored = lm_perplexity(d, d.filter(is_target)).select(
        "doc_id", "n_tokens", F.round("ln_ppl", 8).alias("ln_ppl")
    )
    # two lineages (threshold scalar + bucket projection): one barrier
    scored = scored.localCheckpoint(eager=True)
    # the terciles are a bounded 2-double stats fetch (the sanctioned
    # collect class — same as PageRank's convergence stats); inlining
    # them as literals keeps the bucket pass a map-only projection
    # with NO join at all — the plan you want at 100 TB, and the
    # plan-hygiene gate's point: a 1-row crossJoin here compiles to
    # the BroadcastNestedLoopJoin node the gate bans
    t1, t2 = scored.agg(
        F.round(F.expr("percentile(ln_ppl, 1.0d/3)"), 4),
        F.round(F.expr("percentile(ln_ppl, 2.0d/3)"), 4),
    ).first()
    bucket = (
        F.when(F.col("ln_ppl") <= F.lit(t1), "head")
        .when(F.col("ln_ppl") <= F.lit(t2), "middle")
        .otherwise("tail")
    )
    return scored.select(
        "doc_id", "n_tokens", "ln_ppl", bucket.alias("bucket")
    )


# dialect-portable PII patterns (Java regex AND RE2 — no lookaround, no
# backreferences; \b word boundaries are supported by both).  The phone
# pattern is the strict +CC (NNN) NNN-NNNN form: a loose "digit runs
# with separators" pattern would false-positive on ordinary numeric
# text and, worse, match DIFFERENT spans under the two engines'
# leftmost-longest vs leftmost-first alternation rules — strict
# fixed-shape patterns behave identically in both.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\+[0-9]{1,3} \([0-9]{3}\) [0-9]{3}-[0-9]{4}"
PII_IPV4_RE = r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b"


def pii_scrub(docs, text_col: str = "text", id_col: str = "doc_id"):
    """(id, n_emails, n_phones, n_ips, redacted): per-document PII
    span counts plus the text with every span replaced by a typed
    placeholder — the standard pre-training redaction pass (C4 /
    Dolma / FineWeb all ship one).  Email → phone → IPv4, applied in
    that fixed order so the count and the redaction see the same
    spans (an IPv4-shaped substring inside an email domain is the
    email's, not the IP pass's).

    Scale shape: pure JVM ``regexp_count`` / ``regexp_replace``
    projections — whole-stage codegen, no shuffle, no Python; at
    100 TB this is a map-only pass that pushes column pruning into
    the scan.
    """
    t = F.col(text_col)
    after_email = F.regexp_replace(t, PII_EMAIL_RE, "<EMAIL>")
    after_phone = F.regexp_replace(after_email, PII_PHONE_RE, "<PHONE>")
    redacted = F.regexp_replace(after_phone, PII_IPV4_RE, "<IP>")
    return docs.select(
        F.col(id_col),
        F.regexp_count(t, F.lit(PII_EMAIL_RE)).alias("n_emails"),
        F.regexp_count(after_email, F.lit(PII_PHONE_RE)).alias("n_phones"),
        F.regexp_count(after_phone, F.lit(PII_IPV4_RE)).alias("n_ips"),
        redacted.alias("redacted"),
    )


# deterministic PII-bearing derived text: the fixture corpus is a
# synthetic word salad with no PII, so the registry query plants
# spans from the fixture's own columns — the SAME concat expression
# both engines, making the scrub non-vacuous and value-checked.
_PII_TEXT_SQL = """
      text
      || CASE WHEN doc_id % 7 = 0
              THEN ' contact user' || doc_id || '@mail.example.com now'
              ELSE '' END
      || CASE WHEN doc_id % 11 = 0
              THEN ' from 10.' || (doc_id % 256) || '.0.' || (doc_id % 100)
              ELSE '' END
      || CASE WHEN doc_id % 13 = 0
              THEN ' call +1 (555) 01' || (doc_id % 10) || '-20'
                   || lpad(CAST(doc_id % 100 AS STRING), 2, '0') || ' ok'
              ELSE '' END
"""


@register(
    "q_pii_scrub",
    f"""
    WITH planted AS (
      SELECT doc_id, {_PII_TEXT_SQL} AS text FROM documents
    ),
    e AS (
      SELECT doc_id,
             len(regexp_extract_all(text, '{PII_EMAIL_RE}')) AS n_emails,
             regexp_replace(text, '{PII_EMAIL_RE}', '<EMAIL>', 'g') AS t1
      FROM planted
    ),
    p AS (
      SELECT doc_id, n_emails,
             len(regexp_extract_all(t1, '{PII_PHONE_RE}')) AS n_phones,
             regexp_replace(t1, '{PII_PHONE_RE}', '<PHONE>', 'g') AS t2
      FROM e
    )
    SELECT doc_id, n_emails, n_phones,
           len(regexp_extract_all(t2, '{PII_IPV4_RE}')) AS n_ips,
           regexp_replace(t2, '{PII_IPV4_RE}', '<IP>', 'g') AS redacted
    FROM p
    """,
)
def q_pii_scrub(spark, sf_dir):
    """PII redaction over deterministically planted spans (emails on
    doc_id%7, IPv4 on %11, phones on %13 — the same concat expression
    both engines): counts per type + the fully redacted text,
    value-checked including the redacted string itself."""
    d = _t(spark, sf_dir, "documents")
    planted = d.select(
        "doc_id",
        F.expr(_PII_TEXT_SQL).alias("text"),
    )
    return pii_scrub(planted)


def bpe_merges(
    docs,
    text_col: str = "text",
    rounds: int = 3,
):
    """(rnd, left_sym, right_sym, pair_count): the first ``rounds``
    byte-pair-encoding merge rules learned from the corpus (Sennrich
    et al. 2016) — the tokenizer-TRAINING counterpart of the BPE-ish
    pre-tokenizer count in q_token_count.  Deterministic argmax per
    round: highest pair count, ties broken (left, right) ascending.

    Distributed shape: BPE trains on the WORD-FREQUENCY table, not the
    corpus — one partial-aggregable token groupBy reduces 100 TB of
    text to a vocabulary-sized (word, count) frame, and every merge
    round is an explode → partial-agg pair count over that small frame
    plus a 1-row argmax FETCH (BPE is inherently sequential — each
    merge depends on the last — so the per-round driver round-trip is
    the algorithm's own serialization, the bounded-scalar collect
    class, and the learned rule rewrites the next round as pure
    literals: a map-only projection, no join).  The corpus is read
    exactly once, and the returned merge table is rounds-sized — a
    driver-scale artifact by definition.

    If the corpus exhausts its adjacent pairs before ``rounds`` merges
    (every word fully merged — BPE's natural termination), training
    STOPS and the learned prefix is returned: fewer than ``rounds``
    rows, never NULL-padded rows.

    Symbol encoding: a word's symbol sequence is kept as a string with
    TWO-space delimiters and two-space padding ("␣␣f␣␣a␣␣s␣␣t␣␣"), so
    applying a merge is a plain leftmost non-overlapping
    ``replace(seq, ' x  y ', ' xy ')`` — each match consumes ONE pad
    space from each boundary and the replacement restores it, which
    (a) can never match inside a longer symbol and (b) reproduces
    BPE's greedy left-to-right non-overlapping semantics identically
    in Spark and DuckDB ("a a a a" merges to "aa aa", not "aa a a").
    """
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    toks = ws_tokens(text_col)
    words = (
        docs.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )
    chars = F.regexp_extract_all("w", F.lit("."), 0)
    seqs = words.select(
        F.concat(
            F.lit("  "), F.array_join(chars, "  "), F.lit("  ")
        ).alias("seq"),
        "cnt",
    ).localCheckpoint(eager=False)
    spark = docs.sparkSession
    merges = []
    for r in range(1, rounds + 1):
        sym = F.filter(F.split("seq", "  "), lambda s: s != "")
        pairs = seqs.select(
            F.explode(
                F.arrays_zip(
                    F.slice(sym, 1, F.size(sym) - 1).alias("x"),
                    F.slice(sym, 2, F.size(sym) - 1).alias("y"),
                )
            ).alias("p"),
            "cnt",
        ).select(F.col("p.x").alias("x"), F.col("p.y").alias("y"), "cnt")
        # argmax by (pc desc, x asc, y asc) as a single partial-agg
        # min over an orderable struct — no global sort, no window;
        # the ungrouped min over ZERO pair rows yields one all-NULL
        # row, which is the exhaustion signal, never an output row
        best = (
            pairs.groupBy("x", "y")
            .agg(F.sum("cnt").alias("pc"))
            .agg(F.min(F.struct((-F.col("pc")).alias("np"), "x", "y")).alias("b"))
            .select("b.x", "b.y", (-F.col("b.np")).alias("pc"))
            .first()
        )
        if best is None or best["x"] is None:
            break  # no adjacent pairs left: every word fully merged
        merges.append((r, best["x"], best["y"], best["pc"]))
        if r < rounds:
            pat = f" {best['x']}  {best['y']} "
            rep = f" {best['x']}{best['y']} "
            seqs = (
                seqs.select(
                    F.replace("seq", F.lit(pat), F.lit(rep)).alias("seq"),
                    "cnt",
                )
                .localCheckpoint(eager=False)
            )
    return spark.createDataFrame(
        merges,
        "rnd INT, left_sym STRING, right_sym STRING, pair_count BIGINT",
    )


def _bpe_chain_sql(
    rounds: int, carry_word: bool = False, rewrite_last: bool = False
) -> str:
    """The shared WITH-chain both BPE oracles unroll: per round a
    lateral adjacent-pair unnest over the word-frequency table, a
    LIMIT-1 argmax under the identical (pc DESC, x, y) rule, and the
    same single-space-in-double-space replace rewrite.  ``carry_word``
    keeps the word key in the s-tables (the encode oracle needs the
    word → sequence mapping); ``rewrite_last`` also applies round
    ``rounds``'s merge (training stops before it, encoding applies
    every learned rule)."""
    wcol = "w, " if carry_word else ""
    parts = [
        f"""
    WITH words AS (
      SELECT t AS w, count(*) AS cnt
      FROM (SELECT unnest({_TOKS}) AS t FROM documents)
      GROUP BY t
    ),
    s0 AS MATERIALIZED (
      SELECT {wcol}'  ' || array_to_string(regexp_extract_all(w, '.'), '  ')
             || '  ' AS seq, cnt
      FROM words
    )"""
    ]
    for r in range(1, rounds + 1):
        parts.append(f""",
    p{r} AS (
      SELECT sym[i] AS x, sym[i + 1] AS y, sum(cnt) AS pc
      FROM (
        SELECT list_filter(string_split(seq, '  '), z -> z <> '') AS sym,
               cnt
        FROM s{r - 1}
      ), unnest(range(1, len(sym))) AS u(i)
      GROUP BY sym[i], sym[i + 1]
    ),
    b{r} AS MATERIALIZED (
      SELECT x, y, pc FROM p{r} ORDER BY pc DESC, x, y LIMIT 1
    )""")
        if r < rounds or rewrite_last:
            # an exhausted round (empty b{r}) must leave seq UNCHANGED
            # — a bare replace against the empty scalar subquery would
            # NULL every seq, the SQL twin of the Spark-side
            # NULL-poisoning bug bpe_merges' exhaustion break fixed
            parts.append(f""",
    s{r} AS MATERIALIZED (
      SELECT {wcol}CASE
               WHEN (SELECT count(*) FROM b{r}) = 0 THEN seq
               ELSE replace(
                 seq,
                 ' ' || (SELECT x FROM b{r}) || '  '
                     || (SELECT y FROM b{r}) || ' ',
                 ' ' || (SELECT x FROM b{r})
                     || (SELECT y FROM b{r}) || ' '
               ) END AS seq, cnt
      FROM s{r - 1}
    )""")
    return "".join(parts)


def _bpe_oracle_sql(rounds: int = 3) -> str:
    """Unrolled DuckDB mirror of ``bpe_merges``.

    ``pc`` comes out of DuckDB's ``SUM(BIGINT)`` as HUGEINT (int128);
    Spark emits BIGINT for the same sum, and the driver's value hash is
    type-aware, so the cast keeps bit-identical values from hashing
    differently (the one red row of CORRECTNESS_r04)."""
    selects = [
        f"SELECT {r} AS rnd, x AS left_sym, y AS right_sym,"
        f" CAST(pc AS BIGINT) AS pair_count FROM b{r}"
        for r in range(1, rounds + 1)
    ]
    return (
        _bpe_chain_sql(rounds)
        + "\n    "
        + "\n    UNION ALL ".join(selects)
    )


@register("q_bpe_merges", _bpe_oracle_sql(3))
def q_bpe_merges(spark, sf_dir):
    """First 3 BPE merge rules learned from the fixture corpus,
    value-checked round-for-round (rule AND pair count) against the
    unrolled DuckDB replay."""
    d = _t(spark, sf_dir, "documents")
    return bpe_merges(d, rounds=3)


def bpe_encode_vocab(docs, merges, text_col: str = "text"):
    """(w, syms array<string>, n_syms): every distinct corpus word
    encoded under a learned merge-rule table — ``merges`` is the
    driver-side list of (left_sym, right_sym) in rank order, exactly
    what ``bpe_merges(...).collect()`` yields.  Applying a rule is one
    LITERAL ``replace`` over the two-space symbol encoding (see
    ``bpe_merges``), so the whole encoder is a chain of k map-only
    whole-stage-codegen projections over the VOCABULARY-sized distinct
    frame — the corpus text is tokenized once and never rewritten."""
    seq = F.concat(
        F.lit("  "),
        F.array_join(F.regexp_extract_all("w", F.lit("."), 0), "  "),
        F.lit("  "),
    )
    enc = (
        docs.select(F.explode(ws_tokens(text_col)).alias("w"))
        .distinct()
        .select("w", seq.alias("seq"))
    )
    for x, y in merges:
        enc = enc.select(
            "w",
            F.replace(
                "seq", F.lit(f" {x}  {y} "), F.lit(f" {x}{y} ")
            ).alias("seq"),
        )
    syms = F.filter(F.split("seq", "  "), lambda s: s != "")
    return enc.select("w", syms.alias("syms"), F.size(syms).alias("n_syms"))


def bpe_encode(
    docs, merges, text_col: str = "text", id_col: str = "doc_id"
):
    """(id, n_words, n_bpe_tokens): per-document token counts under a
    learned BPE vocabulary — the tokenizer-APPLICATION counterpart of
    ``bpe_merges`` (train on a sample, encode the corpus: the standard
    pre-training cost/length accounting pass).

    Scale shape: the vocabulary is encoded once (``bpe_encode_vocab``,
    k literal map-only rewrites over the distinct-word frame), then the
    corpus explodes to (doc, word) and equi-joins the word → n_syms
    table — one partial-aggregable groupBy per doc.  The merge table is
    a rounds-sized driver artifact by construction, never a shuffle
    side."""
    enc = bpe_encode_vocab(docs, merges, text_col).select("w", "n_syms")
    ct = docs.select(
        F.col(id_col).alias("_id"), F.explode(ws_tokens(text_col)).alias("w")
    )
    return (
        ct.join(enc, "w")
        .groupBy("_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_syms").alias("n_bpe_tokens"),
        )
        .select(F.col("_id").alias(id_col), "n_words", "n_bpe_tokens")
    )


_BPE_ENCODE_ORACLE = (
    _bpe_chain_sql(3, carry_word=True, rewrite_last=True)
    + f""",
    enc AS (
      SELECT w,
             len(list_filter(string_split(seq, '  '), z -> z <> ''))
               AS n_syms
      FROM s3
    ),
    ct AS (SELECT doc_id, unnest({_TOKS}) AS t FROM documents)
    SELECT ct.doc_id,
           count(*) AS n_words,
           CAST(sum(enc.n_syms) AS BIGINT) AS n_bpe_tokens
    FROM ct JOIN enc ON enc.w = ct.t
    GROUP BY ct.doc_id
    """
)


@register("q_bpe_encode", _BPE_ENCODE_ORACLE)
def q_bpe_encode(spark, sf_dir):
    """Train 3 merge rules on the fixture corpus, then encode every
    document with them: per-doc word and BPE-symbol counts,
    value-checked against the DuckDB replay that unrolls BOTH the
    training argmax rounds and the encode rewrites."""
    d = _t(spark, sf_dir, "documents")
    rules = [
        (r["left_sym"], r["right_sym"])
        for r in bpe_merges(d, rounds=3).orderBy("rnd").collect()
    ]
    return bpe_encode(d, rules)


def bm25_scores(
    docs,
    query_terms,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """(id, score): Okapi BM25 relevance of every matching document for
    a bag of query terms (Robertson & Zaragoza 2009; the Lucene idf
    variant ln(1 + (N − df + ½)/(df + ½)), which is always ≥ 0) — the
    standard retrieval scorer a corpus-curation pipeline uses for
    topic-targeted slicing and search-style QA checks.

    score(d) = Σ_t idf(t) · tf/(tf + k1·(1 − b + b·dl/avgdl)).

    Scale shape: one tokenize/explode pass; the query-term table is a
    broadcast semi-filter, so only matching (doc, term) rows survive to
    the two partial-aggregable groupBys (tf per doc-term, df per term);
    N and avgdl are bounded 1-row driver scalars baked into the score
    expression as literals (the kmeans-centroid class — a 1-row
    crossJoin would plan as the BNLJ node the hygiene sweep bans).
    avgdl is computed as exact-integer sum(dl)/count so both engines
    see the identical double; no window, no Python in the plan.
    """
    if k1 < 0 or not (0 <= b <= 1):
        raise ValueError(f"need k1 >= 0 and 0 <= b <= 1, got {k1}, {b}")
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    spark = docs.sparkSession
    qt = F.broadcast(
        spark.createDataFrame(
            [(t,) for t in sorted(set(query_terms))], "t STRING"
        )
    )
    toks = ws_tokens(text_col)
    dlens = docs.select(
        F.col(id_col).alias("_id"), F.size(toks).alias("dl")
    ).localCheckpoint(eager=False)  # feeds scalars AND the score join
    # N / avgdl as bounded 1-row driver scalars baked in as literals
    # (the kmeans-centroid class — NOT a crossJoin: a 1-row broadcast
    # scalar plans as BroadcastNestedLoopJoin, the node the plan-
    # hygiene sweep bans outright).  avgdl = exact-int sum / exact-int
    # count in Python IEEE division — the identical double DuckDB's
    # sum(dl)::DOUBLE / count(*) produces.
    srow = dlens.agg(
        F.count("*").alias("n"), F.sum("dl").alias("s")
    ).collect()[0]
    n_docs = int(srow["n"])
    if n_docs == 0:
        raise ValueError("bm25_scores: empty corpus")
    avgdl = int(srow["s"]) / n_docs
    ct = docs.select(
        F.col(id_col).alias("_id"), F.explode(toks).alias("t")
    ).join(qt, "t")
    tf = ct.groupBy("_id", "t").agg(F.count("*").alias("tf"))
    df = tf.groupBy("t").agg(F.count("*").alias("df"))
    k1c, bc = F.lit(float(k1)), F.lit(float(b))
    return (
        tf.join(F.broadcast(df), "t")
        .join(dlens, "_id")
        .select(
            "_id",
            (
                F.log(
                    F.lit(1.0)
                    + (F.lit(n_docs) - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                )
                * F.col("tf")
                / (
                    F.col("tf")
                    + k1c
                    * (
                        F.lit(1.0)
                        - bc
                        + bc * F.col("dl") / F.lit(avgdl)
                    )
                )
            ).alias("s"),
        )
        .groupBy("_id")
        .agg(F.sum("s").alias("score"))
        .select(F.col("_id").alias(id_col), "score")
    )


@register(
    "q_bm25",
    f"""
    WITH dl AS (
      SELECT doc_id, len({_TOKS}) AS dl FROM documents
    ),
    sc AS (
      SELECT count(*) AS n_docs,
             sum(dl)::DOUBLE / count(*) AS avgdl
      FROM dl
    ),
    ct AS (
      SELECT doc_id, unnest({_TOKS}) AS t FROM documents
    ),
    qt AS (
      SELECT t FROM (
        SELECT t, count(*) AS c FROM ct GROUP BY t
        ORDER BY c DESC, t ASC LIMIT 3
      )
    ),
    tf AS (
      SELECT ct.doc_id, ct.t, count(*) AS tf
      FROM ct JOIN qt ON qt.t = ct.t
      GROUP BY ct.doc_id, ct.t
    ),
    df AS (SELECT t, count(*) AS df FROM tf GROUP BY t)
    SELECT tf.doc_id,
           round(sum(ln(1.0 + (sc.n_docs - df.df + 0.5) / (df.df + 0.5))
                     * tf.tf
                     / (tf.tf + 1.2 * (1.0 - 0.75
                                       + 0.75 * dl.dl / sc.avgdl))), 8)
             AS score
    FROM tf
    JOIN df ON df.t = tf.t
    JOIN dl ON dl.doc_id = tf.doc_id
    CROSS JOIN sc
    GROUP BY tf.doc_id
    """,
)
def q_bm25(spark, sf_dir):
    """BM25 scores for the corpus's 3 most-frequent tokens (count desc,
    term asc — deterministic both engines), value-checked per document
    against DuckDB's identical formula; round(,8) absorbs the ≤3-term
    summation order."""
    d = _t(spark, sf_dir, "documents")
    toks = ws_tokens("text")
    top = [
        r["t"]
        for r in (
            d.select(F.explode(toks).alias("t"))
            .groupBy("t")
            .agg(F.count("*").alias("c"))
            .orderBy(F.col("c").desc(), F.col("t").asc())
            .limit(3)
            .collect()
        )
    ]
    out = bm25_scores(d, top)
    return out.select("doc_id", F.round("score", 8).alias("score"))


def pack_chunks(
    docs,
    capacity: int = 512,
    n_shards: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """(shard, chunk, doc_id, seg_start, seg_len): concat-and-chunk
    sequence packing — the layout step that turns a curated corpus into
    fixed-length training sequences (the GPT-style "pack documents
    nose-to-tail, cut every ``capacity`` tokens" rule; a doc may
    straddle a chunk boundary, in which case it emits one segment row
    per chunk it touches).  Σ seg_len per (shard, chunk) == capacity
    for every interior chunk by construction — the invariant a training
    loader relies on.

    Deterministic rule (cross-engine, retry-stable): docs shard by
    md5(doc_id) % n_shards, pack within a shard in doc_id order; token
    counts are ``ws_tokens`` lengths.  Zero-token docs emit nothing.

    Scale shape: ONE shuffle to the shard key, a per-shard running-sum
    window (partitioned — each shard sorts independently, and n_shards
    is sized to the cluster so no single sort is global), then a
    map-side sequence() explode.  All-integer arithmetic end to end;
    at 100 TB the shard count replaces a global sort entirely — there
    is no total order across shards, by design.
    """
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    from pyspark.sql import Window as W

    sized = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(ws_tokens(text_col)).alias("n"),
        F.pmod(
            F.conv(
                F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
            ).cast("bigint"),
            F.lit(n_shards),
        ).alias("shard"),
    ).filter(F.col("n") > 0)
    w = (
        W.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    c = F.lit(capacity)
    placed = sized.select(
        "shard",
        "doc_id",
        "n",
        F.coalesce(F.sum("n").over(w), F.lit(0)).alias("start"),
    )
    return placed.select(
        "shard",
        F.explode(
            F.sequence(
                F.floor(F.col("start") / c),
                F.floor((F.col("start") + F.col("n") - 1) / c),
            )
        ).alias("chunk"),
        "doc_id",
        "start",
        "n",
    ).select(
        "shard",
        "chunk",
        "doc_id",
        F.greatest(F.lit(0), F.col("chunk") * c - F.col("start")).alias(
            "seg_start"
        ),
        (
            F.least(F.col("n"), (F.col("chunk") + 1) * c - F.col("start"))
            - F.greatest(F.lit(0), F.col("chunk") * c - F.col("start"))
        ).alias("seg_len"),
    )


@register(
    "q_pack_chunks",
    f"""
    WITH sized AS (
      SELECT doc_id, len({_TOKS}) AS n,
             ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 4
               AS shard
      FROM documents
      WHERE len({_TOKS}) > 0
    ),
    placed AS (
      SELECT shard, doc_id, n,
             coalesce(sum(n) OVER (PARTITION BY shard ORDER BY doc_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), 0)::BIGINT AS start
      FROM sized
    ),
    seg AS (
      SELECT shard, u.chunk, doc_id, start, n
      FROM placed,
           unnest(range(start // 512, (start + n - 1) // 512 + 1))
             AS u(chunk)
    )
    SELECT shard, chunk, doc_id,
           greatest(0, chunk * 512 - start) AS seg_start,
           least(n, (chunk + 1) * 512 - start)
             - greatest(0, chunk * 512 - start) AS seg_len
    FROM seg
    """,
)
def q_pack_chunks(spark, sf_dir):
    """Concat-and-chunk sequence packing (capacity 512, 4 shards) over
    the documents table — every (shard, chunk, doc, segment) placement
    row is value-checked against DuckDB's identical window-cumsum +
    range-unnest replay (all-integer, no rounding anywhere)."""
    d = _t(spark, sf_dir, "documents")
    return pack_chunks(d, capacity=512, n_shards=4)


def pack_bins(
    docs,
    capacity: int = 512,
    n_shards: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """(shard, bin, doc_id, n): greedy NEXT-FIT bin packing without
    document splitting — the other standard training-sequence layout
    (T5-style "pack whole examples, pad the remainder"; pack_chunks is
    the GPT-style splitting variant).  Docs shard by md5(doc_id) %
    n_shards and pack within a shard in doc_id order: a doc joins the
    current bin iff fill + n <= capacity, else it opens the next bin
    (an oversized doc therefore always sits alone in its own bin —
    next-fit never splits).

    Next-fit is inherently SEQUENTIAL — bin state threads through the
    scan — so this is the canonical applyInPandas operator: parallel
    ACROSS shards (size n_shards to the cluster), one Arrow-batched
    linear pass WITHIN a shard.  No global order exists anywhere, by
    design, and the per-shard pass is O(rows), not a window/join.  The
    DuckDB oracle replays the same recurrence as a recursive CTE
    advancing every shard one doc per round.
    """
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    import pandas as pd

    sized = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(ws_tokens(text_col)).alias("n"),
        F.pmod(
            F.conv(
                F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
            ).cast("bigint"),
            F.lit(n_shards),
        ).alias("shard"),
    ).filter(F.col("n") > 0)

    cap = int(capacity)

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        bins, fill, b = [], None, -1
        for n in pdf["n"]:
            if fill is None or fill + n > cap:
                b, fill = b + 1, int(n)
            else:
                fill += int(n)
            bins.append(b)
        pdf["bin"] = pd.Series(bins, dtype="int64")
        return pdf[["shard", "bin", "doc_id", "n"]]

    # the id column keeps its source type (bigint doc ids in the
    # fixtures, string paths in a real corpus) — hardcoding bigint
    # breaks the Arrow conversion for string ids
    id_type = sized.schema["doc_id"].dataType.simpleString()
    return sized.groupBy("shard").applyInPandas(
        _pack, f"shard bigint, bin bigint, doc_id {id_type}, n int"
    )


@register(
    "q_pack_bins",
    f"""
    WITH RECURSIVE sized AS (
      SELECT doc_id, n, shard,
             row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS idx
      FROM (
        SELECT doc_id, len({_TOKS}) AS n,
               ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 4
                 AS shard
        FROM documents
        WHERE len({_TOKS}) > 0
      )
    ),
    step(shard, idx, bin, fill) AS (
      SELECT shard, 1::BIGINT, 0::BIGINT, n::BIGINT
      FROM sized WHERE idx = 1
      UNION ALL
      SELECT s.shard, s.idx,
             CASE WHEN st.fill + s.n <= 512 THEN st.bin ELSE st.bin + 1 END,
             CASE WHEN st.fill + s.n <= 512 THEN st.fill + s.n
                  ELSE s.n::BIGINT END
      FROM step st JOIN sized s ON s.shard = st.shard AND s.idx = st.idx + 1
    )
    SELECT s.shard, st.bin, s.doc_id, s.n::INT AS n
    FROM step st JOIN sized s ON s.shard = st.shard AND s.idx = st.idx
    """,
)
def q_pack_bins(spark, sf_dir):
    """Greedy next-fit no-split bin packing (capacity 512, 4 shards):
    the applyInPandas sequential-per-shard pass, value-checked row for
    row against a DuckDB recursive CTE that advances every shard one
    doc per round."""
    d = _t(spark, sf_dir, "documents")
    return pack_bins(d, capacity=512, n_shards=4)
