"""Conditional exercise of the Iceberg format seam (SURVEY.md §4.4).

The production path of the north rule reads an Iceberg table of
source-code repositories; this sandbox ships no Iceberg runtime jars,
so CorpusIO(fmt='iceberg') is normally covered only through the
identical-schema parquet path.  This test makes the seam
runtime-selectable evidence rather than dead config: it probes for an
``iceberg-spark-runtime`` jar and, when one exists, round-trips the
corpus through a REAL local hadoop-type Iceberg catalog in a fresh
subprocess JVM (the shared session fixture cannot take catalog conf),
asserting row count and per-row content sha256 equality.  Without the
jar it SKIPS, loudly naming the reason.
"""

import glob
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _iceberg_runtime_jars() -> list[str]:
    import pyspark

    spark_home = os.environ.get("SPARK_HOME") or os.path.dirname(
        pyspark.__file__
    )
    pats = (
        os.path.join(spark_home, "jars", "iceberg-spark-runtime*.jar"),
        os.path.expanduser("~/.ivy2/jars/*iceberg-spark-runtime*.jar"),
    )
    return [j for p in pats for j in glob.glob(p)]


DRIVER = r"""
import hashlib, json, sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession, functions as F
from sparkgatha.corpus import generate_corpus
from sparkgatha.io import CorpusIO

warehouse = {warehouse!r}
spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.extensions",
            "org.apache.iceberg.spark.extensions"
            ".IcebergSparkSessionExtensions")
    .config("spark.sql.catalog.local",
            "org.apache.iceberg.spark.SparkCatalog")
    .config("spark.sql.catalog.local.type", "hadoop")
    .config("spark.sql.catalog.local.warehouse", warehouse)
    .getOrCreate()
)
src = generate_corpus(spark, 200, num_partitions=4).localCheckpoint()
io = CorpusIO("iceberg")
io.write(src, "local.db.corpus")
back = io.read(spark, "local.db.corpus")
digest = lambda df: sorted(
    r[0] for r in df.select(F.sha2("content", 256)).collect()
)
print("RESULT " + json.dumps({
    "rows_src": src.count(),
    "rows_back": back.count(),
    "sha_equal": digest(src) == digest(back),
    "schema_equal": sorted(src.columns) == sorted(back.columns),
}))
spark.stop()
"""


@pytest.mark.skipif(
    not _iceberg_runtime_jars(),
    reason="no iceberg-spark-runtime jar in SPARK_HOME/jars or ~/.ivy2 "
    "— the format seam runs on its parquet twin in this sandbox",
)
def test_corpus_io_iceberg_catalog_roundtrip(tmp_path):
    proc = subprocess.run(
        [
            sys.executable,
            "-u",
            "-c",
            DRIVER.format(repo=REPO, warehouse=str(tmp_path / "wh")),
        ],
        capture_output=True,
        text=True,
        timeout=600,
    )
    result = None
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            result = json.loads(line[len("RESULT ") :])
    assert result is not None, proc.stderr[-2000:]
    assert result["rows_src"] == result["rows_back"] > 0
    assert result["sha_equal"] and result["schema_equal"]
