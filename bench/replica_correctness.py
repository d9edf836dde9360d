"""Emit the local replica of the driver's correctness gate as a
committable JSON artifact (ADVICE r4: replica pass claims for keys
outside the 50-slot driver window had no committed evidence).

Runs EVERY oracle-backed REGISTRY entry through the same comparison
tests/test_relational.py uses (row count + column names +
order-insensitive normalized values vs DuckDB) and writes one JSON
object per key to the output path, plus a summary line to stdout.

Usage::

    python bench/replica_correctness.py [--sf-dir /root/testdata/sf0.01]
        [--out REPLICA_CORRECTNESS_r05.json] [--only name1,name2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=os.path.join(
        REPO, "REPLICA_CORRECTNESS_r05.json"))
    ap.add_argument("--only", default=None,
                    help="comma list of registry keys (default: all "
                         "oracle-backed entries)")
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from oracle_harness import compare, duck_con
    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.ui.enabled", "false")
        .appName("replica-correctness")
        .getOrCreate()
    )
    con = duck_con(args.sf_dir)
    registry = entrymod._registry()
    names = (
        [n.strip() for n in args.only.split(",")]
        if args.only
        else [n for n, s in registry.items() if s.oracle is not None]
    )
    results: dict[str, dict] = {}
    n_pass = 0
    for name in names:
        spec = registry[name]
        t0 = time.monotonic()
        try:
            problems = compare(spec.fn(spark, args.sf_dir), con, spec.oracle)
            results[name] = {
                "match": not problems,
                "problems": problems or None,
                "wall_s": round(time.monotonic() - t0, 2),
            }
            n_pass += not problems
        except Exception as exc:  # committed artifact must name failures
            results[name] = {
                "match": False,
                "problems": [f"{type(exc).__name__}: {exc}"[:500]],
                "wall_s": round(time.monotonic() - t0, 2),
            }
        status = "ok" if results[name]["match"] else "FAIL"
        print(f"{status} {name} ({results[name]['wall_s']}s)",
              file=sys.stderr)
    artifact = {
        "sf_dir": args.sf_dir,
        "comparison": "rows + columns + order-insensitive normalized "
                      "values (tests/oracle_harness.py)",
        "n_checked": len(names),
        "n_pass": n_pass,
        "results": results,
    }
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
    print(json.dumps({"n_checked": len(names), "n_pass": n_pass,
                      "out": args.out}))
    spark.stop()


if __name__ == "__main__":
    main()
