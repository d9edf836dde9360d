"""Supplementary per-query benchmark (r6) — NOT the frozen driver
harness (bench.py is the measured contract and stays untouched).

Times individual registry queries in isolation with the noop sink
(optimization guide §1.4: computes every column of every row, discards
the output, shows in the SQL tab as a real write) so a query's wall is
its computation, not the sink or a `.count()`'s column pruning.

Usage::

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
        python bench_extra.py [--runs 3] [--only q_a,q_b] [--json out]

Prints one line per query: name, per-run walls, and the min; with
--json also writes {"name": {"walls": [...], "min": w}} for
before/after bookkeeping in OPTIMIZATION_r*.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--only", default=None,
                    help="comma list of registry keys (default: the "
                         "bench.py timed set)")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    from sparkgatha.session import get_spark

    spark = get_spark(
        "sparkgatha-bench-extra",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "12g"},
    )
    import __spark_entry__ as entrymod

    reg = entrymod.queries()
    if args.only:
        names = [n.strip() for n in args.only.split(",")]
    else:
        names = [n for n in reg]
    out: dict[str, dict] = {}
    for name in names:
        if name not in reg:
            print(f"{name}: NOT IN REGISTRY", flush=True)
            continue
        fn = reg[name]
        walls = []
        for _ in range(max(args.runs, 1)):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.monotonic()
            # noop sink: eagerly computes every column of every row
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            walls.append(round(time.monotonic() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = {"walls": walls, "min": min(walls)}
        print(f"{name}: {walls} min={min(walls)}", flush=True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"sf": SF_DIR, "cpus": CPUS, "queries": out}, f,
                      indent=1, sort_keys=True)
    spark.stop()


if __name__ == "__main__":
    main()
