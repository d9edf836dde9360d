"""spark-submit --py-files deployment smoke (north rule: "run via
spark-submit --py-files on a multi-executor cluster").

Everything else in the suite exercises the engine in-process; this file
proves the actual cluster ship path: ``python -m sparkgatha package``
builds the archive, and a REAL ``spark-submit --py-files sparkgatha.zip``
subprocess — with the repo deliberately absent from the driver's import
path — imports the engine out of the zip and runs PageRank end-to-end.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVER = """\
import sys

import sparkgatha

# the whole point: the package must resolve from the --py-files archive,
# not from a checkout that happens to be importable
assert "sparkgatha.zip" in sparkgatha.__file__.replace("\\\\", "/"), (
    sparkgatha.__file__
)

from pyspark.sql import SparkSession

from sparkgatha.graph.pagerank import pagerank

spark = SparkSession.builder.getOrCreate()
edges = spark.createDataFrame(
    [(0, 1, 1.0), (1, 2, 1.0), (2, 0, 1.0), (0, 2, 1.0), (3, 0, 1.0)],
    "src long, dst long, weight double",
)
r = pagerank(edges, num_partitions=2, max_iter=10, tol=1e-9)
r.ranks.write.mode("overwrite").parquet(sys.argv[1])
print("DRIVER_OK iterations=%d" % r.iterations)
"""


def test_package_zip_is_deterministic_and_complete(tmp_path):
    import sparkgatha.__main__ as cli

    z1, z2 = str(tmp_path / "a.zip"), str(tmp_path / "b.zip")
    assert cli.main(["package", "--out", z1]) == 0
    assert cli.main(["package", "--out", z2]) == 0
    with open(z1, "rb") as f1, open(z2, "rb") as f2:
        assert f1.read() == f2.read()  # byte-identical rebuilds
    with zipfile.ZipFile(z1) as zf:
        names = zf.namelist()
    # package root importable as `sparkgatha`, submodules present
    assert "sparkgatha/__init__.py" in names
    for mod in ("graph/pagerank.py", "extract.py", "relational.py",
                "dedup.py", "similarity.py", "__main__.py"):
        assert f"sparkgatha/{mod}" in names, mod
    assert not any("__pycache__" in n for n in names)


def test_spark_submit_pyfiles_runs_pagerank(tmp_path, spark):
    spark_submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    if not os.path.exists(spark_submit):
        pytest.skip("spark-submit binary not on this host")

    import sparkgatha.__main__ as cli

    zip_path = str(tmp_path / "sparkgatha.zip")
    assert cli.main(["package", "--out", zip_path]) == 0
    driver = tmp_path / "driver.py"
    driver.write_text(DRIVER)
    out_dir = str(tmp_path / "ranks")

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [spark_submit, "--master", "local[2]",
         "--conf", "spark.ui.enabled=false",
         "--conf", "spark.sql.shuffle.partitions=2",
         "--py-files", zip_path, str(driver), out_dir],
        cwd=str(tmp_path),  # repo NOT on the driver's path
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "DRIVER_OK" in proc.stdout, proc.stdout[-2000:]

    ranks = spark.read.parquet(out_dir)
    assert ranks.count() == 4
    total = ranks.agg(F.sum("rank")).collect()[0][0]
    assert abs(total - 1.0) < 1e-9


def test_package_refuses_empty_dir(tmp_path):
    from sparkgatha.packaging import build_pyfiles_zip

    empty = tmp_path / "pkg"
    empty.mkdir()
    with pytest.raises(FileNotFoundError):
        build_pyfiles_zip(str(tmp_path / "z.zip"), package_dir=str(empty))
