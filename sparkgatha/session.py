"""SparkSession factory.

Reference analog: AGATHA attaches a dask.distributed.Client and registers
per-worker preloaded state (agatha/construct/dask_process_global.py — see
SURVEY.md §3.1).  Here the equivalent "cluster attach" is a SparkSession
with the engine's standard configuration: Arrow enabled for every pandas
UDF boundary, AQE on for runtime re-planning (skew-join splits, partition
coalescing), and shuffle partitions sized to the adjacency layout so
co-partitioning survives across supersteps (SURVEY.md §4.3).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Default number of shuffle partitions == default adjacency partitions.
#: Must stay in sync so the superstep join reuses the edge-side exchange.
DEFAULT_PARTITIONS = 32


def get_spark(
    app_name: str = "sparkgatha",
    master: str | None = None,
    shuffle_partitions: int = DEFAULT_PARTITIONS,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32)
    in the sandbox; on a real cluster it is supplied by spark-submit and
    must be left None.
    """
    if master is None and "SPARK_GRAFT_CPUS" in os.environ:
        master = f"local[{os.environ['SPARK_GRAFT_CPUS']}]"

    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)

    conf = {
        "spark.sql.shuffle.partitions": str(shuffle_partitions),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.session.timeZone": "UTC",
        # float64 everywhere; never silently upcast to decimal
        "spark.sql.legacy.allowNegativeScaleOfDecimal": "true",
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)

    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
