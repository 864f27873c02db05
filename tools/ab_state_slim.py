"""A/B: PageRank committed-state slimming (round-4 change — the `pr` column
is dropped from the committed per-iteration state when with_prev=False, since
the L1 delta it feeds is already computed by the CollectMetrics node upstream
of the projection).

with_prev=True keeps the pre-slimming 4-column state (id, out_deg, rank, pr)
and is otherwise plan-identical, so it doubles as the "before" arm. Each arm
runs in a cold JVM on the same fixture; we record per-iteration wall and the
cached bytes of the committed-state localCheckpoint RDD (the same columns
flow through the per-iteration join shuffle, so cached-state bytes are a
direct proxy for bytes shuffled per iteration too).

Writes BENCH/ab_state_slim.json.

Usage: python tools/ab_state_slim.py [--edges .bench_cache/synth_edges_16M.parquet]
           [--cores 8] [--iters 6]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUN = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from scalemine_spark.session import get_spark
from pyspark.sql import functions as F
from scalemine_spark.algorithms import pagerank

cores = {cores}
spark = get_spark("slim", cores=cores, shuffle_partitions=2 * cores)
spark.sparkContext.setLogLevel("ERROR")
edges = spark.read.parquet({edges!r}).repartition(2 * cores, "src").persist()
n = edges.count()
t0 = time.monotonic()
ranks, info = pagerank(edges, fixed_iters={iters}, with_prev={with_prev})
ranks.agg(F.sum("rank")).collect()
wall = time.monotonic() - t0
cached = []
for ri in spark.sparkContext._jsc.sc().getRDDStorageInfo():
    cached.append({{"name": ri.name(), "mem_bytes": ri.memSize(),
                    "parts": ri.numCachedPartitions()}})
print("RESULT " + json.dumps({{
    "wall": round(wall, 3), "n_edges": n,
    "iter_seconds": [round(x, 3) for x in info["iter_seconds"]],
    "cached_rdds": cached,
}}))
spark.stop()
"""


def run_arm(edges: str, cores: int, iters: int, with_prev: bool) -> dict:
    code = RUN.format(repo=REPO, edges=edges, cores=cores, iters=iters, with_prev=with_prev)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True,
                         timeout=1800)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT (rc={out.returncode}):\n{out.stderr[-2000:]}")


def state_bytes(arm: dict) -> int:
    """The committed state is the only localCheckpoint cache left after the
    run (pagerank unpersists its edge/vertex caches; the outer edge cache is
    a parquet scan RDD, name contains 'FileScan')."""
    cands = [r for r in arm["cached_rdds"] if "FileScan" not in r["name"]]
    return max((r["mem_bytes"] for r in cands), default=0)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", default=os.path.join(REPO, ".bench_cache", "synth_edges_16M.parquet"))
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--iters", type=int, default=6)
    args = ap.parse_args()

    arms = {}
    for label, wp in [("slim_3col", False), ("prev_4col", True)]:
        arms[label] = run_arm(args.edges, args.cores, args.iters, wp)
        print(f"  {label}: wall={arms[label]['wall']}s "
              f"state_bytes={state_bytes(arms[label])}", file=sys.stderr)

    b3, b4 = state_bytes(arms["slim_3col"]), state_bytes(arms["prev_4col"])
    steady3 = arms["slim_3col"]["iter_seconds"][2:]
    steady4 = arms["prev_4col"]["iter_seconds"][2:]
    summary = {
        "state_bytes_slim": b3,
        "state_bytes_with_prev": b4,
        "state_bytes_reduction": round(1 - b3 / b4, 3) if b4 else None,
        "steady_iter_s_slim": round(sum(steady3) / len(steady3), 3),
        "steady_iter_s_with_prev": round(sum(steady4) / len(steady4), 3),
        "arms": arms,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "ab_state_slim.json"), "w") as fh:
        json.dump(summary, fh, indent=1)
    print(json.dumps({k: v for k, v in summary.items() if k != "arms"}))


if __name__ == "__main__":
    main()
