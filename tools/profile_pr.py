"""Per-iteration PageRank profiling: where does the fixed cost C go?

Runs pagerank(fixed_iters=N) on a cached synth edge table and prints each
iteration's wall time (info['iter_seconds']). C = asymptotic per-iteration
time on a tiny graph; W = per-iteration compute on the real graph.

Usage: python tools/profile_pr.py --edges .bench_cache/synth_edges_16M.parquet --cores 8 [--iters 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", default=".bench_cache/synth_edges_16M.parquet")
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--tiny", action="store_true", help="use a 50k-edge slice (isolates C)")
    ap.add_argument("--aqe", default="false")
    ap.add_argument("--spmv", default="codegen", choices=["codegen", "arrow"])
    ap.add_argument("--hub-threshold", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from scalemine_spark.algorithms import pagerank
    from scalemine_spark.session import get_spark

    spark = get_spark(
        "profile-pr", cores=args.cores, shuffle_partitions=2 * args.cores,
        extra_conf={"spark.sql.adaptive.enabled": args.aqe},
    )
    spark.sparkContext.setLogLevel("ERROR")
    edges = spark.read.parquet(os.path.join(REPO, args.edges))
    if args.tiny:
        edges = edges.limit(50000)
    t0 = time.monotonic()
    ranks, info = pagerank(
        edges, fixed_iters=args.iters, spmv=args.spmv, hub_threshold=args.hub_threshold
    )
    ranks.agg(F.sum("rank")).collect()
    wall = time.monotonic() - t0
    out = {
        "cores": args.cores,
        "spmv": args.spmv,
        "n_edges": info["n_edges"],
        "wall": round(wall, 2),
        "iter_seconds": [round(x, 3) for x in info["iter_seconds"]],
        "eps": round(info["edges_per_sec"], 1),
    }
    print("RESULT " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
