"""G13/S6 — convergence metrics + per-partition lineage (SURVEY.md §2.11).

Reference analog: AGATHA's checkpoint phases record completion only
(agatha/construct/dask_checkpoint.py — SURVEY.md §1.1.5); the north rule
upgrades this to per-superstep delta-L1, active-vertex counts, and
per-partition lineage shas (BASELINE.json north_star).

Lineage fingerprints are *order- and partitioning-insensitive*: each row
is hashed (xxhash64 over its canonical string form) and the per-partition
hashes fold with XOR, so the same logical state produces the same sha at
any partition count — required for resume-equivalence tests (L5).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

METRICS_SCHEMA = (
    "run_id string, iteration int, delta_l1 double, active_vertices long, "
    "rows long, wall_ms double, lineage_sha string"
)


def state_fingerprint(state: DataFrame) -> str:
    """Order/partitioning-insensitive sha of a state DataFrame.

    xxhash64 per row over all columns (doubles canonicalized to 12
    significant digits so fp noise below the correctness tolerance does
    not change lineage), folded with bit_xor.
    """
    cols = []
    for f in state.schema.fields:
        c = F.col(f.name)
        if f.dataType.simpleString() in ("double", "float"):
            c = F.format_number(c.cast("double"), 12)
        cols.append(c.cast("string"))
    row = state.select(
        F.xxhash64(F.concat_ws("\x1f", *cols)).alias("h")
    )
    agg = row.agg(
        F.expr("bit_xor(h)").alias("x"), F.count("*").alias("n")
    ).collect()[0]
    return f"{agg['x'] or 0:016x}-{agg['n']}"


def partition_fingerprints(state: DataFrame) -> list[dict]:
    """Per-partition lineage: (partition_id, rows, sha)."""
    cols = [F.col(f.name).cast("string") for f in state.schema.fields]
    rows = (
        state.select(
            F.spark_partition_id().alias("pid"),
            F.xxhash64(F.concat_ws("\x1f", *cols)).alias("h"),
        )
        .groupBy("pid")
        .agg(F.expr("bit_xor(h)").alias("sha"), F.count("*").alias("rows"))
        .collect()
    )
    return [
        {"partition_id": r["pid"], "rows": r["rows"], "sha": f"{r['sha']:016x}"}
        for r in sorted(rows, key=lambda r: r["pid"])
    ]


def rank_delta(
    new: DataFrame, old: DataFrame, key: str, value: str, eps: float = 1e-9
) -> tuple[float, int]:
    """(delta_l1, active_vertex_count) between two state DataFrames."""
    j = new.alias("n").join(old.alias("o"), key, "full_outer")
    d = F.abs(
        F.coalesce(F.col(f"n.{value}"), F.lit(0.0))
        - F.coalesce(F.col(f"o.{value}"), F.lit(0.0))
    )
    row = j.agg(
        F.sum(d).alias("delta_l1"),
        F.sum(F.when(d > eps, 1).otherwise(0)).alias("active"),
    ).collect()[0]
    return float(row["delta_l1"] or 0.0), int(row["active"] or 0)


class MetricsSink:
    """S6: append one row per superstep to a parquet `_metrics` table.

    Local-friendly implementation: buffers rows on the driver and writes
    JSON lines per iteration (atomic, append-only); `to_parquet` exports
    the full table.  At cluster scale the same rows would go to an
    Iceberg append — the schema is identical (METRICS_SCHEMA).
    """

    def __init__(self, base_dir: str | None, run_id: str):
        self.base_dir = base_dir
        self.run_id = run_id
        self.rows: list[dict] = []
        if base_dir:
            os.makedirs(base_dir, exist_ok=True)

    def record(
        self,
        iteration: int,
        delta_l1: float,
        active_vertices: int,
        rows: int,
        wall_ms: float,
        lineage_sha: str,
    ) -> dict:
        row = {
            "run_id": self.run_id,
            "iteration": iteration,
            "delta_l1": delta_l1,
            "active_vertices": active_vertices,
            "rows": rows,
            "wall_ms": wall_ms,
            "lineage_sha": lineage_sha,
            "ts": time.time(),
        }
        self.rows.append(row)
        if self.base_dir:
            with open(os.path.join(self.base_dir, "_metrics.jsonl"), "a") as f:
                f.write(json.dumps(row) + "\n")
        return row

    def to_dataframe(self, spark: SparkSession) -> DataFrame:
        return spark.createDataFrame(
            [
                (
                    r["run_id"],
                    r["iteration"],
                    r["delta_l1"],
                    r["active_vertices"],
                    r["rows"],
                    r["wall_ms"],
                    r["lineage_sha"],
                )
                for r in self.rows
            ],
            METRICS_SCHEMA,
        )
