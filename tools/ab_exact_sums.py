"""A/B: what does exact-decimal SpMV accumulation cost PageRank?

Context (round 5): double addition is not associative and the per-key
merge order of shuffled partial sums is fetch-timing — a resumed replay
can land 1 ulp off the continuous run (measured on HITS, the same agg
shape; fixed there with decimal(38,18) accumulation, which is
associative and therefore merge-order-free). pagerank(exact_sums=True)
offers the same bit-exact-replay guarantee; this tool measures its
throughput cost so the default (False, double sums — the flagship
SpMV-throughput path; score contract is allclose 1e-6) is an informed
trade rather than a guess.

Variants, interleaved reps (base, exact, base, exact, ...), cold JVM per
run, single parallelism level (this is a cost A/B, not a scaling pair):
  base   — pagerank(..., exact_sums=False)
  exact  — pagerank(..., exact_sums=True)

Usage: python tools/ab_exact_sums.py [--cores 8] [--pr-iters 8] [--reps 2] \
           [--edges .bench_cache/synth_edges_16M.parquet]
Writes BENCH/ab_exact_sums.json.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUN_ONE = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from scalemine_spark.session import get_spark
from pyspark.sql import functions as F
from scalemine_spark.algorithms import pagerank

cores = {cores}
spark = get_spark("ab_exact", cores=cores, shuffle_partitions=2 * cores,
                  extra_conf={{"spark.sql.adaptive.enabled": "false"}})
spark.sparkContext.setLogLevel("ERROR")
edges = spark.read.parquet({edges_path!r}).repartition(2 * cores, "src").persist()
n_edges = edges.count()

t0 = time.monotonic()
ranks, info = pagerank(edges, fixed_iters={pr_iters}, exact_sums={exact})
ranks.agg(F.sum("rank")).collect()
t_pr = time.monotonic() - t0
steady = info["iter_seconds"][2:]
print("RESULT " + json.dumps({{
    "t_pr": round(t_pr, 2),
    "iter_seconds": [round(x, 3) for x in info["iter_seconds"]],
    "pr_eps": n_edges * {pr_iters} / t_pr,
    "pr_eps_steady": n_edges / (sum(steady) / len(steady)),
}}))
"""


def run_once(cores: int, edges_path: str, pr_iters: int, exact: bool) -> dict:
    code = RUN_ONE.format(
        repo=REPO, cores=cores, edges_path=edges_path, pr_iters=pr_iters,
        exact=exact,
    )
    out = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT (exact={exact}, rc={out.returncode}):\n{out.stderr[-2000:]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--pr-iters", type=int, default=8)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--edges", default=os.path.join(REPO, ".bench_cache/synth_edges_16M.parquet"))
    args = ap.parse_args()

    runs: dict[str, list[dict]] = {"base": [], "exact": []}
    for rep in range(args.reps):
        for name, exact in (("base", False), ("exact", True)):
            r = run_once(args.cores, args.edges, args.pr_iters, exact)
            runs[name].append(r)
            print(f"  rep{rep} {name}: t_pr={r['t_pr']}s eps={r['pr_eps']:.0f} "
                  f"steady={r['pr_eps_steady']:.0f}", file=sys.stderr)

    summary = {}
    for name, rs in runs.items():
        summary[name] = {
            "runs": rs,
            "eps_median": statistics.median(r["pr_eps"] for r in rs),
            "eps_steady_median": statistics.median(r["pr_eps_steady"] for r in rs),
        }
    ratio = summary["exact"]["eps_median"] / summary["base"]["eps_median"]
    ratio_s = summary["exact"]["eps_steady_median"] / summary["base"]["eps_steady_median"]
    summary["exact_over_base"] = {"total": round(ratio, 3), "steady": round(ratio_s, 3)}

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "ab_exact_sums.json"), "w") as fh:
        json.dump(summary, fh, indent=1)
    print(json.dumps({"exact_over_base": summary["exact_over_base"]}))


if __name__ == "__main__":
    main()
