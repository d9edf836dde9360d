"""Sources & sinks (SURVEY.md §2.1, S1–S6).

Reference analog: AGATHA reads MEDLINE XML.gz via FTP and parses per-file
(agatha/construct/ftp_util.py, document_parsers/ — per SURVEY.md §2.1);
serving storage is a key→JSON-neighbors SQLite store
(agatha/util/sqlite3_lookup.py).  The Spark-native replacements are
columnar scans with pushdown and sorted, range-partitioned Parquet.

Iceberg seam (SURVEY.md §4.4): production uses ``format('iceberg')``;
this sandbox has no Iceberg runtime jars, so ``CorpusIO`` takes
``fmt='parquet'|'iceberg'`` and everything else is format-agnostic.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """S2: scan one driver fixture table (TESTDATA.md)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def read_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: read_table(spark, sf_dir, t) for t in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for t in TESTDATA_TABLES:
        read_table(spark, sf_dir, t).createOrReplaceTempView(t)


class CorpusIO:
    """S1: the Iceberg-shaped source-code corpus
    ``(repo, path, commit, lang, content)`` (BASELINE.json input_hint).

    ``fmt='iceberg'`` is the production path (catalog table name);
    ``fmt='parquet'`` is the sandbox path (directory of parquet files
    with identical schema).  Column pruning + predicate pushdown reach
    the scan in both cases because callers express plans declaratively.
    """

    def __init__(self, fmt: str = "parquet"):
        if fmt not in ("parquet", "iceberg"):
            raise ValueError(f"unsupported corpus format: {fmt}")
        self.fmt = fmt

    def read(self, spark: SparkSession, location: str) -> DataFrame:
        if self.fmt == "iceberg":
            return spark.read.format("iceberg").load(location)
        return spark.read.parquet(location)

    def write(self, df: DataFrame, location: str, mode: str = "overwrite") -> None:
        if self.fmt == "iceberg":
            df.writeTo(location).createOrReplace()
        else:
            df.write.mode(mode).parquet(location)


def write_manifest(path: str, manifest: dict) -> None:
    """Tiny JSON snapshot manifest emulating Iceberg metadata in the
    sandbox (SURVEY.md §4.4): schema + lineage sha + row counts."""
    with open(path, "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)


def read_manifest(path: str) -> dict | None:
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def write_adjacency(edges: DataFrame, path: str, num_partitions: int = 32) -> None:
    """S5: graph serving export — the Spark-idiomatic replacement for the
    reference's SQLite adjacency store (agatha/util/sqlite3_lookup.py):
    range-partitioned by src, sorted (src, dst) within partitions, so a
    reader can binary-search a single file for one vertex's neighbors."""
    (
        edges.repartitionByRange(num_partitions, "src")
        .sortWithinPartitions("src", "dst")
        .write.mode("overwrite")
        .parquet(path)
    )
