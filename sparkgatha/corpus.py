"""M1 — deterministic Iceberg-shaped source-code corpus generator +
sha256 per-row invariant (BASELINE.json input_hint; FIXTURES.md §B).

Schema: (repo string, path string, commit string, lang string,
content string) — generated distributed (no driver-side row loop): a
``spark.range`` seed column drives vectorized pandas-UDF synthesis, so
the same code generates 1k rows for unit tests or 10^9 at cluster scale.
Content is a seeded token stream over a fixed identifier vocabulary with
Zipf-ish frequencies (guarantees hub terms for the skew tests).

The per-row invariant (BASELINE.json: "content sha256 equality") is a
companion manifest table (repo, path, commit, content_sha256) written at
generation time; ``verify_sha256`` re-hashes the corpus read path with
JVM-side ``sha2`` and anti-joins against the manifest — zero rows means
the engine reads exactly the bytes the reference would.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

LANGS = ["py", "java", "go", "js", "rs"]
EXT = {"py": "py", "java": "java", "go": "go", "js": "js", "rs": "rs"}

# fixed identifier vocabulary; Zipf-ranked (index 0 = hub term)
VOCAB = [
    "data", "get", "set", "run", "init", "node", "edge", "graph", "map",
    "list", "key", "value", "index", "count", "hash", "join", "filter",
    "sort", "merge", "split", "read", "write", "open", "close", "parse",
    "build", "load", "save", "check", "update", "delete", "insert",
    "query", "batch", "stream", "buffer", "cache", "lock", "thread",
    "pool", "task", "job", "config", "util", "test", "main", "core",
    "base", "impl", "handler",
]

CORPUS_SCHEMA = "repo string, path string, commit string, lang string, content string"


def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Vectorized row synthesis from seed ids (mapInPandas kernel)."""
    import hashlib

    vocab = np.array(VOCAB)
    # Zipf-ish weights over the vocabulary, fixed
    ranks = np.arange(1, len(vocab) + 1, dtype=np.float64)
    probs = (1.0 / ranks**1.2)
    probs /= probs.sum()

    for pdf in batches:
        ids = pdf["id"].to_numpy()
        out = {"repo": [], "path": [], "commit": [], "lang": [], "content": []}
        for i in ids:
            rng = np.random.default_rng(np.random.PCG64(42 + int(i)))
            repo = f"org{i % 13}/repo{i % 97}"
            lang = LANGS[int(rng.integers(0, len(LANGS)))]
            path = f"src/m{i % 37}/f{i % 101}.{EXT[lang]}"
            commit = hashlib.sha256(f"{repo}/{path}".encode()).hexdigest()[:40]
            n_tok = int(rng.integers(20, 401))
            toks = rng.choice(vocab, size=n_tok, p=probs)
            out["repo"].append(repo)
            out["path"].append(path)
            out["commit"].append(commit)
            out["lang"].append(lang)
            out["content"].append(" ".join(toks))
        yield pd.DataFrame(out)


def generate_corpus(
    spark: SparkSession, n_rows: int, num_partitions: int = 32
) -> DataFrame:
    """Deterministic corpus: same (n_rows) → identical rows at any
    partition count (seed is the row id, not the partition)."""
    seeds = spark.range(0, n_rows, 1, num_partitions)
    return seeds.mapInPandas(_synth, schema=CORPUS_SCHEMA)


def sha_manifest(corpus: DataFrame) -> DataFrame:
    """(repo, path, commit, content_sha256) — written at generation."""
    return corpus.select(
        "repo", "path", "commit", F.sha2("content", 256).alias("content_sha256")
    )


def verify_sha256(corpus: DataFrame, manifest: DataFrame) -> int:
    """Per-row invariant check (test layer L4): count of rows whose
    re-hashed content does NOT match the manifest. 0 == verified."""
    hashed = corpus.select(
        "repo", "path", "commit", F.sha2("content", 256).alias("content_sha256")
    )
    return hashed.join(
        manifest, ["repo", "path", "commit", "content_sha256"], "left_anti"
    ).count()
