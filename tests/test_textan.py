

def test_importance_weights_ranks_target_like_docs_higher(spark):
    """A doc written in target-distinctive vocabulary outscores a doc of
    corpus-common vocabulary; tokens absent from both LMs are impossible
    (scoring joins the corpus LM built from the scored corpus itself)."""
    from sparkgatha.textan import importance_weights

    corpus = spark.createDataFrame(
        [
            (1, "quantum flux capacitor resonance"),   # target-like
            (2, "mundane filler boilerplate chatter"),  # corpus-like
            (3, "mundane filler boilerplate chatter"),
            (4, "mundane filler boilerplate chatter"),
        ],
        ["doc_id", "text"],
    )
    target = spark.createDataFrame(
        [(9, "quantum flux capacitor resonance quantum flux")],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r.log_ratio
            for r in importance_weights(corpus, target).collect()}
    assert rows[1] > rows[2]
    assert rows[2] == rows[3] == rows[4]
    import pytest

    with pytest.raises(ValueError):
        importance_weights(corpus, target, smoothing=0.0)


def test_lm_perplexity_scores_train_like_docs_lower(spark):
    """Docs resembling the training slice get lower perplexity; OOV-heavy
    docs score strictly higher; the smoothing guard raises."""
    from sparkgatha.textan import lm_perplexity

    train = spark.createDataFrame(
        [(9, "the quick brown fox the quick brown fox")],
        ["doc_id", "text"],
    )
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox"),       # in-distribution
            (2, "zzz yyy xxx www"),           # all OOV
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r.ln_ppl for r in lm_perplexity(corpus, train).collect()}
    assert rows[1] < rows[2]
    import math
    # all-OOV doc: every token scores the same smoothed floor
    # a/(T + a(V+1)) with T=8, V=4 → ln_ppl = ln(13)
    assert abs(rows[2] - math.log(13.0)) < 1e-9
    import pytest

    with pytest.raises(ValueError):
        lm_perplexity(corpus, train, smoothing=0.0)


def test_pii_scrub_redacts_crafted_spans(spark):
    """Exact span accounting on a crafted row: email inside text, phone
    in the strict +CC (NNN) NNN-NNNN form, IPv4 — and an IPv4-shaped
    substring inside an email domain belongs to the EMAIL pass."""
    from sparkgatha.textan import pii_scrub

    docs = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.org or "
                "call +1 (555) 013-2042 from 10.0.0.42 ok"),
            (2, "server at 192.168.1.1 and user@10.0.0.1.example.com done"),
            (3, "no pii here at all"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in pii_scrub(docs).collect()}
    assert (out[1].n_emails, out[1].n_phones, out[1].n_ips) == (1, 1, 1)
    assert out[1].redacted == "mail <EMAIL> or call <PHONE> from <IP> ok"
    # doc 2: the dotted quad inside the email domain is consumed by the
    # email pass; only the standalone IP remains for the IPv4 pass
    assert (out[2].n_emails, out[2].n_ips) == (1, 1)
    assert out[2].redacted == "server at <IP> and <EMAIL> done"
    assert (out[3].n_emails, out[3].n_phones, out[3].n_ips) == (0, 0, 0)
    assert out[3].redacted == "no pii here at all"


def test_bpe_merges_matches_pure_python_reference(spark):
    """The learned merge table equals a pure-Python BPE trainer run on
    the same word-frequency table under the same (count desc, pair asc)
    argmax — including the greedy left-to-right merge semantics on
    runs ('aaaa' → 'aa aa', not 'aa a a')."""
    from collections import Counter

    from sparkgatha.textan import bpe_merges

    texts = [
        "aaaa aaaa banana banana bandana",
        "banana aaaa bane bane bane",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )

    def python_bpe(texts, rounds):
        words = Counter(w for t in texts for w in t.lower().split())
        seqs = {w: list(w) for w in words}
        merges = []
        for r in range(1, rounds + 1):
            pc = Counter()
            for w, cnt in words.items():
                s = seqs[w]
                for i in range(len(s) - 1):
                    pc[(s[i], s[i + 1])] += cnt
            (x, y), c = min(
                pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )
            merges.append((r, x, y, c))
            for w in seqs:
                s, out, i = seqs[w], [], 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == x and s[i + 1] == y:
                        out.append(x + y)
                        i += 2
                    else:
                        out.append(s[i])
                        i += 1
                seqs[w] = out
        return merges

    expect = python_bpe(texts, 4)
    got = [
        (r.rnd, r.left_sym, r.right_sym, r.pair_count)
        for r in bpe_merges(docs, rounds=4).orderBy("rnd").collect()
    ]
    assert got == expect
    import pytest

    with pytest.raises(ValueError):
        bpe_merges(docs, rounds=0)


def test_mixture_weights_rebalances_toward_tail(spark):
    """Temperature α<1 boosts tail groups (>1) and damps the head (<1);
    weights renormalize to 1; α guard raises."""
    from sparkgatha.pipeline import mixture_weights

    docs = spark.createDataFrame(
        [(i, "en" if i < 90 else "sw") for i in range(100)],
        ["doc_id", "lang"],
    )
    rows = {r.lang: r for r in mixture_weights(docs, "lang", 0.3).collect()}
    assert rows["en"].boost < 1 < rows["sw"].boost
    assert abs(rows["en"].w + rows["sw"].w - 1.0) < 1e-12
    assert abs(rows["en"].p - 0.9) < 1e-12
    import pytest

    with pytest.raises(ValueError):
        mixture_weights(docs, "lang", alpha=0.0)


def test_lm_perplexity_empty_train_raises(spark):
    """An empty/all-whitespace train slice raises loudly at execution
    (in-plan guard) instead of silently scoring every doc NULL."""
    import pytest

    from sparkgatha.textan import lm_perplexity

    corpus = spark.createDataFrame([(1, "some text")], ["doc_id", "text"])
    empty_train = spark.createDataFrame([(9, "   ")], ["doc_id", "text"])
    with pytest.raises(Exception, match="zero tokens"):
        lm_perplexity(corpus, empty_train).collect()


def test_bpe_merges_stops_at_exhaustion(spark):
    """When the corpus runs out of adjacent pairs before `rounds` merges
    (BPE's natural termination), training stops and returns the learned
    prefix — never NULL-padded rows."""
    from sparkgatha.textan import bpe_merges

    docs = spark.createDataFrame([(1, "ab ab ab")], ["doc_id", "text"])
    rows = bpe_merges(docs, rounds=5).orderBy("rnd").collect()
    assert [(r.rnd, r.left_sym, r.right_sym, r.pair_count) for r in rows] == [
        (1, "a", "b", 3)
    ]


def test_lm_perplexity_plan_shape(spark):
    """The PRE-checkpoint scoring plan (the part q_lm_perplexity's
    barrier hides from the test_plan_hygiene sweep — see its KNOWN
    LIMIT note): no cartesian product, no Python stage, and the only
    nested-loop join is the sanctioned 1-row scalar attach."""
    import re

    from sparkgatha.textan import lm_perplexity

    corpus = spark.createDataFrame(
        [(i, f"tok{i} tok{i % 3} shared") for i in range(20)],
        ["doc_id", "text"],
    )
    plan = (
        lm_perplexity(corpus, corpus)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert not re.search(r"BatchEvalPython(?!UDTF)", plan)
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_bpe_encode_matches_pure_python_reference(spark):
    """Encoding under learned rules equals the pure-Python greedy
    left-to-right merge application; zero rules = character count; the
    per-doc counts aggregate the vocabulary encoding exactly."""
    from sparkgatha.textan import bpe_encode, bpe_encode_vocab, bpe_merges

    texts = ["aaaa banana bane", "banana bandana aaaa aaaa"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    rules = [
        (r.left_sym, r.right_sym)
        for r in bpe_merges(docs, rounds=3).orderBy("rnd").collect()
    ]

    def py_encode(word, rules):
        s = list(word)
        for x, y in rules:
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == x and s[i + 1] == y:
                    out.append(x + y)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            s = out
        return s

    vocab = {r.w: list(r.syms) for r in bpe_encode_vocab(docs, rules).collect()}
    words = {w for t in texts for w in t.split()}
    assert set(vocab) == words
    for w in words:
        assert vocab[w] == py_encode(w, rules), w

    per_doc = {
        r.doc_id: (r.n_words, r.n_bpe_tokens)
        for r in bpe_encode(docs, rules).collect()
    }
    for i, t in enumerate(texts):
        ws = t.split()
        assert per_doc[i] == (
            len(ws),
            sum(len(py_encode(w, rules)) for w in ws),
        )

    # zero rules: every word encodes to its characters
    chars = {r.w: r.n_syms for r in bpe_encode_vocab(docs, []).collect()}
    assert chars == {w: len(w) for w in words}


def test_bpe_oracles_handle_exhaustion_like_spark(spark):
    """On a corpus with fewer merges than rounds, both DuckDB oracles
    (training and encode) agree with the Spark side instead of
    NULL-poisoning the exhausted rounds."""
    import duckdb

    from sparkgatha.textan import (
        _BPE_ENCODE_ORACLE,
        _bpe_oracle_sql,
        bpe_encode,
        bpe_merges,
    )

    docs = [(1, "ab ab"), (2, "ab")]
    d = spark.createDataFrame(docs, "doc_id INT, text STRING")
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM (VALUES "
                + ", ".join(f"({i}, '{t}')" for i, t in docs)
                + ") AS t(doc_id, text)")

    # training: one merge exists; both sides emit exactly one rule
    got_m = [(r.rnd, r.left_sym, r.right_sym, r.pair_count)
             for r in bpe_merges(d, rounds=3).orderBy("rnd").collect()]
    ora_m = con.execute(_bpe_oracle_sql(3)).fetchall()
    assert got_m == [(1, "a", "b", 3)] and sorted(ora_m) == got_m

    # encode: the learned 1-rule prefix encodes every word to 1 symbol
    rules = [(x, y) for _, x, y, _ in got_m]
    got_e = sorted(
        (r.doc_id, r.n_words, r.n_bpe_tokens)
        for r in bpe_encode(d, rules).collect()
    )
    ora_e = sorted(con.execute(_BPE_ENCODE_ORACLE).fetchall())
    assert got_e == [(1, 2, 2), (2, 1, 1)] and ora_e == got_e


def test_bm25_matches_hand_formula_and_ranks_sensibly(spark):
    """Scores equal the hand-computed Okapi formula to fp precision; a
    doc with more query-term hits outranks a longer doc with fewer; the
    guards validate."""
    import math

    import pytest

    from sparkgatha.textan import bm25_scores

    docs = [
        (1, "apple apple banana"),
        (2, "apple pear pear pear pear pear"),
        (3, "kiwi kiwi kiwi"),
    ]
    d = spark.createDataFrame(docs, "doc_id INT, text STRING")
    got = {r.doc_id: r.score for r in bm25_scores(d, ["apple", "banana"]).collect()}
    assert set(got) == {1, 2}  # doc 3 matches nothing

    n_docs, k1, b = 3, 1.2, 0.75
    dls = {i: len(t.split()) for i, t in docs}
    avgdl = sum(dls.values()) / n_docs
    df = {"apple": 2, "banana": 1}

    def idf(t):
        return math.log(1.0 + (n_docs - df[t] + 0.5) / (df[t] + 0.5))

    def score(doc_id, tfs):
        return sum(
            idf(t) * tf / (tf + k1 * (1 - b + b * dls[doc_id] / avgdl))
            for t, tf in tfs.items()
        )

    assert abs(got[1] - score(1, {"apple": 2, "banana": 1})) < 1e-12
    assert abs(got[2] - score(2, {"apple": 1})) < 1e-12
    assert got[1] > got[2]

    with pytest.raises(ValueError):
        bm25_scores(d, [])
    with pytest.raises(ValueError):
        bm25_scores(d, ["apple"], b=1.5)


def test_pack_chunks_matches_pure_python_replay(spark):
    """Every placement row matches a direct Python replay of the rule:
    md5-shard, doc_id-order cumsum, floor-div chunk spans."""
    import hashlib

    from sparkgatha.textan import pack_chunks

    docs = spark.createDataFrame(
        [
            (i, " ".join(f"w{j}" for j in range(1 + (i * 7) % 23)))
            for i in range(40)
        ]
        + [(99, "   ")],  # zero-token doc emits nothing
        ["doc_id", "text"],
    )
    cap, shards = 10, 3
    got = {
        (r.shard, r.chunk, r.doc_id): (r.seg_start, r.seg_len)
        for r in pack_chunks(docs, capacity=cap, n_shards=shards).collect()
    }

    def shard_of(doc_id):
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16) % shards

    want = {}
    per_shard = {}
    for i in range(40):
        n = 1 + (i * 7) % 23
        per_shard.setdefault(shard_of(i), []).append((i, n))
    for s, items in per_shard.items():
        start = 0
        for doc_id, n in sorted(items):
            for chunk in range(start // cap, (start + n - 1) // cap + 1):
                lo = max(0, chunk * cap - start)
                hi = min(n, (chunk + 1) * cap - start)
                want[(s, chunk, doc_id)] = (lo, hi - lo)
            start += n
    assert got == want
    assert not any(d == 99 for (_, _, d) in got)


def test_pack_chunks_capacity_invariants(spark):
    """Training-loader contract at fixture scale: segments partition
    every doc exactly, and every interior (shard, chunk) holds exactly
    ``capacity`` tokens."""
    from pyspark.sql import functions as F

    from sparkgatha.io import read_table
    from sparkgatha.textan import pack_chunks
    from sparkgatha.util import ws_tokens

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    cap = 64
    out = pack_chunks(docs, capacity=cap, n_shards=4).cache()
    # per-doc: segments sum to the doc's token count and tile it
    per_doc = {
        r.doc_id: r.tot
        for r in out.groupBy("doc_id").agg(F.sum("seg_len").alias("tot")).collect()
    }
    toks = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id", F.size(ws_tokens("text")).alias("n")
        ).collect()
        if r.n > 0
    }
    assert per_doc == toks
    # per interior chunk: exactly cap tokens (the last chunk per shard
    # may be short)
    fill = (
        out.groupBy("shard", "chunk").agg(F.sum("seg_len").alias("f")).collect()
    )
    last = {}
    for r in fill:
        last[r.shard] = max(last.get(r.shard, -1), r.chunk)
    for r in fill:
        if r.chunk < last[r.shard]:
            assert r.f == cap, (r.shard, r.chunk, r.f)
        else:
            assert 0 < r.f <= cap
    out.unpersist()

    import pytest

    with pytest.raises(ValueError):
        pack_chunks(docs, capacity=0)
    with pytest.raises(ValueError):
        pack_chunks(docs, n_shards=0)


def test_pack_bins_next_fit_replay_and_invariants(spark):
    """Next-fit no-split packing matches the pure-Python recurrence;
    no multi-doc bin exceeds capacity; an oversized doc sits alone;
    bin ids are contiguous from 0 per shard."""
    import hashlib

    import pytest

    from sparkgatha.textan import pack_bins

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(1 + (i * 11) % 17)))
         for i in range(30)]
        + [(777, " ".join(f"x{j}" for j in range(25)))],  # oversized
        ["doc_id", "text"],
    )
    cap, shards = 10, 3
    got = {
        (r.shard, r.doc_id): (r.bin, r.n)
        for r in pack_bins(docs, capacity=cap, n_shards=shards).collect()
    }

    def shard_of(d):
        return int(hashlib.md5(str(d).encode()).hexdigest()[:15], 16) % shards

    lens = {i: 1 + (i * 11) % 17 for i in range(30)}
    lens[777] = 25
    per_shard = {}
    for d, n in lens.items():
        per_shard.setdefault(shard_of(d), []).append((d, n))
    want, fills = {}, {}
    for s, items in per_shard.items():
        fill, b = None, -1
        for d, n in sorted(items):
            if fill is None or fill + n > cap:
                b, fill = b + 1, n
            else:
                fill += n
            want[(s, d)] = (b, n)
            fills.setdefault((s, b), 0)
            fills[(s, b)] += n
    assert got == want
    for (s, b), f in fills.items():
        members = [d for (s2, d), (b2, _) in want.items() if s2 == s and b2 == b]
        assert f <= cap or len(members) == 1, (s, b, f, members)
    for s in per_shard:
        bins = sorted({b for (s2, _), (b, _) in want.items() if s2 == s})
        assert bins == list(range(len(bins)))
    with pytest.raises(ValueError):
        pack_bins(docs, capacity=0)
