"""A/B the PageRank inner-path variants at bench scale (VERDICT r2 #3a/#6):

  codegen   — JVM HashAggregate partial+final SpMV (current default)
  arrow     — operators.spmv mapInArrow numpy/arrow partial combine (U3)
  hub<T>    — hub-broadcast split: ranks of vertices with outdeg >= T are
              broadcast and joined map-side; the tail shuffles normally

Fresh cold JVM per run, interleaved variant order so host drift hits all
variants equally. Two inputs: the 60M power-law synthetic (organic hubs) and
a 16M + one-200k-out-edge-hub synthetic (the north rule's "broadcast of
high-degree hub vectors" scenario). Idle machine required.

Usage: python tools/ab_pr_variants.py [--cores 8] [--iters 6] [--pairs 2]
Writes BENCH/ab_pr_variants.json and prints a table.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
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
spark = get_spark("ab", cores=cores, shuffle_partitions=2 * cores,
                  extra_conf={{"spark.sql.adaptive.enabled": "false"}})
spark.sparkContext.setLogLevel("ERROR")
edges = spark.read.parquet({edges!r}).repartition(2 * cores, "src").persist()
n = edges.count()
t0 = time.monotonic()
ranks, info = pagerank(edges, fixed_iters={iters}, spmv={spmv!r},
                       hub_threshold={hub})
ranks.agg(F.sum("rank")).collect()
dt = time.monotonic() - t0
steady = info["iter_seconds"][2:]
print("RESULT " + json.dumps({{
    "n_edges": n, "t": dt, "eps": n * {iters} / dt,
    "iter_seconds": [round(x, 3) for x in info["iter_seconds"]],
    "eps_steady": n / (sum(steady) / len(steady)),
}}))
spark.stop()
"""

HUB_GEN = r"""
import sys
sys.path.insert(0, {repo!r})
from scalemine_spark.session import get_spark
from scalemine_spark.fixtures import synth_edges_distributed
from pyspark.sql import functions as F

spark = get_spark("gen", cores=16, shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
base = synth_edges_distributed(spark, 16_000_000, 1_600_000, seed=43)
hub = spark.range(1, 200_001).select(F.lit(0).cast("long").alias("src"),
                                     F.col("id").alias("dst"))
out = base.unionByName(hub).distinct()
out.repartition(32, "src").write.mode("overwrite").parquet({path!r})
print("GENERATED", out.count())
spark.stop()
"""


def run_once(edges: str, cores: int, iters: int, spmv: str, hub) -> dict:
    code = RUN.format(repo=REPO, edges=edges, cores=cores, iters=iters, spmv=spmv, hub=hub)
    r = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True, timeout=3600)
    for line in r.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[7:])
    raise RuntimeError(f"no RESULT (rc={r.returncode}):\n{r.stderr[-1500:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--pairs", type=int, default=2)
    ap.add_argument("--hub-threshold", type=int, default=1000)
    args = ap.parse_args()

    hub_path = os.path.join(REPO, ".bench_cache", "synth_edges_hub16M.parquet")
    if not os.path.exists(hub_path):
        r = subprocess.run(
            [sys.executable, "-c", HUB_GEN.format(repo=REPO, path=hub_path)],
            capture_output=True, text=True, timeout=1200,
        )
        print([ln for ln in r.stdout.splitlines() if ln.startswith("GENERATED")], file=sys.stderr)

    inputs = {
        "60M_powerlaw": os.path.join(REPO, ".bench_cache", "synth_edges_60M.parquet"),
        "16M_megahub": hub_path,
    }
    variants = {
        "codegen": ("codegen", None),
        "arrow": ("arrow", None),
        f"hub{args.hub_threshold}": ("codegen", args.hub_threshold),
    }
    results: dict[str, dict[str, list[dict]]] = {k: {v: [] for v in variants} for k in inputs}
    for p in range(args.pairs):
        for iname, epath in inputs.items():
            for vname, (spmv, hub) in variants.items():
                r = run_once(epath, args.cores, args.iters, spmv, hub)
                results[iname][vname].append(r)
                print(
                    f"pair {p} {iname:13s} {vname:8s}: eps={r['eps']:>10.0f} "
                    f"steady={r['eps_steady']:>10.0f} t={r['t']:.1f}s",
                    file=sys.stderr, flush=True,
                )

    summary = {
        iname: {
            vname: {
                "eps": round(statistics.median(x["eps"] for x in rs), 1),
                "eps_steady": round(statistics.median(x["eps_steady"] for x in rs), 1),
            }
            for vname, rs in vruns.items()
        }
        for iname, vruns in results.items()
    }
    print(json.dumps(summary, indent=1))
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "ab_pr_variants.json"), "w") as fh:
        json.dump({"summary": summary, "runs": results,
                   "config": {"cores": args.cores, "iters": args.iters}}, fh, indent=1)


if __name__ == "__main__":
    main()
