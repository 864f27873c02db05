"""A/B: does pinning the JVM's memory lift PageRank's 2->8 scaling pairs?

Context (round 5): the sandbox restores guest memory lazily and demand
faults cost ~150-640 us/page, recurring whenever freed frames leave the
process (scratch.py module docstring). The python driver pins itself
(mlockall via ctypes) — but PageRank's hot path lives in the EXECUTOR JVM,
whose heap growth, shuffle buffers and tmpfs writes pay the same tax, and
fault handling serializes host-side, which taxes local[8] four times
harder per wall-second than local[2] (Amdahl: a serialized constant F on
top of parallel compute turns eff = (T2+F)/(T2+4F)). Suspected cause of
round-5 PR pairs landing at 0.51-0.70 vs the 0.80 bandwidth ceiling.

Variants, one interleaved (lo, hi) pair each, cold JVM per run:
  base      — as the protocol runs today
  shim      — LD_PRELOAD=tools/native/libmlockall.so for the JVM child
              (constructor mlockall(MCL_CURRENT|MCL_FUTURE); per-process,
              the python test driver already pins itself)
  pretouch  — spark.driver.extraJavaOptions=-Xms<mem> -XX:+AlwaysPreTouch
              (population cost lands at JVM startup, outside timed window)

Usage: python tools/ab_pretouch.py [--cores-pair 2,8] [--pr-iters 10] \
           [--edges .bench_cache/synth_edges_60M.parquet] [--variants base,shim,pretouch]
Writes BENCH/ab_pretouch.json.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUN_ONE = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from scalemine_spark.session import get_spark
from pyspark.sql import functions as F
from scalemine_spark.algorithms import pagerank

cores = {cores}
extra = {{"spark.sql.adaptive.enabled": "false"}}
if {pretouch}:
    mem = os.environ.get("SPARK_DRIVER_MEMORY", "8g")
    extra["spark.driver.extraJavaOptions"] = f"-Xms{{mem}} -XX:+AlwaysPreTouch"
t_setup0 = time.monotonic()
spark = get_spark("ab_pretouch", cores=cores, shuffle_partitions=2 * cores, extra_conf=extra)
spark.sparkContext.setLogLevel("ERROR")
edges = spark.read.parquet({edges_path!r}).repartition(2 * cores, "src").persist()
n_edges = edges.count()
t_setup = time.monotonic() - t_setup0

t0 = time.monotonic()
ranks, info = pagerank(edges, fixed_iters={pr_iters})
ranks.agg(F.sum("rank")).collect()
t_pr = time.monotonic() - t0
steady = info["iter_seconds"][2:]
print("RESULT " + json.dumps({{
    "cores": cores, "t_setup": round(t_setup, 1), "t_pr": round(t_pr, 2),
    "iter_seconds": [round(x, 3) for x in info["iter_seconds"]],
    "pr_eps": n_edges * {pr_iters} / t_pr,
    "pr_eps_steady": n_edges / (sum(steady) / len(steady)),
}}))
"""


def run_once(cores: int, edges_path: str, pr_iters: int, variant: str) -> dict:
    env = dict(os.environ)
    if variant == "shim":
        env["LD_PRELOAD"] = os.path.join(REPO, "tools/native/libmlockall.so")
    code = RUN_ONE.format(
        repo=REPO, cores=cores, edges_path=edges_path, pr_iters=pr_iters,
        pretouch=(variant == "pretouch"),
    )
    out = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True, env=env)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT (variant={variant}, rc={out.returncode}):\n{out.stderr[-2000:]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores-pair", default="2,8")
    ap.add_argument("--pr-iters", type=int, default=10)
    ap.add_argument("--edges", default=os.path.join(REPO, ".bench_cache/synth_edges_60M.parquet"))
    ap.add_argument("--variants", default="base,shim")
    args = ap.parse_args()
    lo, hi = (int(x) for x in args.cores_pair.split(","))

    results = {}
    for variant in args.variants.split(","):
        pair = {}
        for cores in (lo, hi):
            r = run_once(cores, args.edges, args.pr_iters, variant)
            pair[cores] = r
            print(f"  {variant} local[{cores}]: t_pr={r['t_pr']}s setup={r['t_setup']}s "
                  f"eps={r['pr_eps']:.0f} steady={r['pr_eps_steady']:.0f}", file=sys.stderr)
        eff = (pair[hi]["pr_eps"] / pair[lo]["pr_eps"]) / (hi / lo)
        eff_s = (pair[hi]["pr_eps_steady"] / pair[lo]["pr_eps_steady"]) / (hi / lo)
        results[variant] = {"pair": pair, "efficiency": round(eff, 3),
                            "efficiency_steady": round(eff_s, 3)}
        print(f"  {variant}: efficiency total={eff:.3f} steady={eff_s:.3f}", file=sys.stderr)

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "ab_pretouch.json"), "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps({v: {k: results[v][k] for k in ("efficiency", "efficiency_steady")}
                      for v in results}))


if __name__ == "__main__":
    main()
