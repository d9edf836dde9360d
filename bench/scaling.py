"""Two-parallelism-level scaling-efficiency protocol (BASELINE.md).

The north rule's N→4N-executor criterion cannot use a real cluster in
this sandbox, so the evidence is the same job at local[8] vs local[32]
on the SAME seeded input: efficiency = tput(32) / (4 × tput(8)).

Each cell: fresh JVM per run (subprocess), 3 measured runs, median
reported, warm-up supersteps discarded inside each run (bench protocol).

Usage:  python bench/scaling.py [--edges 10000000] [--runs 3]
Writes: BENCH/BASELINE.md (filled results table) + scaling JSON to stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUN_SNIPPET = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from sparkgatha.session import get_spark
from sparkgatha.synthetic import powerlaw_edges
from sparkgatha.graph.pagerank import pagerank, prepare_pagerank

cpus = {cpus}
n_edges = {edges}
spark = get_spark("scaling", master=f"local[{{cpus}}]", shuffle_partitions=cpus,
                  extra_conf={{"spark.ui.enabled": "false",
                              "spark.driver.memory": "12g"}})
e = powerlaw_edges(spark, n_edges, n_vertices=2_000_000, num_partitions=cpus).localCheckpoint(eager=True)
m = e.count()
prep = prepare_pagerank(e, num_partitions=cpus)          # layout: once, outside walls
pagerank(prepared=prep, tol=0.0, max_iter=8)             # warm-up (JIT), discarded
r = pagerank(prepared=prep, tol=0.0, max_iter=10)
total = sum(r.superstep_wall_s)
print("RESULT " + json.dumps({{
    "edges": m, "supersteps": r.iterations,
    "superstep_total_s": round(total, 3),
    "edges_per_sec": round(m * r.iterations / total, 1),
    "walls": [round(w, 3) for w in r.superstep_wall_s],
    "deltas": r.deltas[:3],
}}))
spark.stop()
"""


def run_once(cpus: int, edges: int) -> dict:
    code = RUN_SNIPPET.format(repo=REPO, cpus=cpus, edges=edges)
    out = subprocess.run(
        [sys.executable, "-u", "-c", code],
        capture_output=True, text=True, timeout=1800,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT line (cpus={cpus}):\n{out.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=40_000_000)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH", "BASELINE.md"))
    args = ap.parse_args()

    cells = {}
    for cpus in (8, 32):
        results = [run_once(cpus, args.edges) for _ in range(args.runs)]
        tputs = sorted(r["edges_per_sec"] for r in results)
        cells[cpus] = {
            "median_edges_per_sec": statistics.median(tputs),
            "min": tputs[0],
            "max": tputs[-1],
            "runs": results,
        }
        print(f"local[{cpus}]: median {statistics.median(tputs):,.0f} e/s "
              f"(min {tputs[0]:,.0f}, max {tputs[-1]:,.0f})", file=sys.stderr)

    eff = cells[32]["median_edges_per_sec"] / (4 * cells[8]["median_edges_per_sec"])
    summary = {
        "edges": args.edges,
        "local8_edges_per_sec": cells[8]["median_edges_per_sec"],
        "local32_edges_per_sec": cells[32]["median_edges_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(summary))

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    r8, r32 = cells[8], cells[32]
    with open(args.out, "w") as f:
        f.write(f"""# BENCH/BASELINE — measured scaling results

Protocol (BASELINE.md): same seeded power-law graph ({args.edges:,} edges,
seed=42, hub vertex ≈ 30-40% of edges) at local[8] and local[32]; fresh
JVM per run; 8-superstep JIT warm-up discarded; 10 measured supersteps;
{args.runs} runs per cell, median reported.

Sandbox proxy for the N→4N-executor rule: efficiency =
throughput(local[32]) / (4 x throughput(local[8])).

| run | parallelism | edges | supersteps | edges/sec/superstep (median) | min | max |
| --- | --- | --- | --- | --- | --- | --- |
| B-N  | local[8]  | {args.edges:,} | 10 | {r8['median_edges_per_sec']:,.0f} | {r8['min']:,.0f} | {r8['max']:,.0f} |
| B-4N | local[32] | {args.edges:,} | 10 | {r32['median_edges_per_sec']:,.0f} | {r32['min']:,.0f} | {r32['max']:,.0f} |

**Scaling efficiency: {eff:.3f}** (target >= 0.8 — {"PASS" if eff >= 0.8 else "MISS"})

Notes:
- PageRank strategy: broadcast-gather (edges hash-partitioned by dst once,
  rank vector broadcast per superstep, aggregation partition-local — the
  superstep itself is shuffle-free). The shuffle strategy (src-partitioned
  edges + state shuffle) is the >2x10^7-vertex path and is exercised by
  tests.
- AQE disabled inside the loop (measured 15-30x superstep regression on).
- Host is a shared VM (~16% historical CPU steal measured); min/max spread
  reflects that noise, hence median-of-{args.runs}.
""")


if __name__ == "__main__":
    main()
