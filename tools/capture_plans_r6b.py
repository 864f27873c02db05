"""Capture .explain('formatted') before/after plans for the late-round-6
optimizations (plans/r06/):

  * pr_prepare_verts — pagerank._prepare's (id, out_deg) vertex build:
    before = distinct endpoints LEFT JOIN out-degree aggregate (replayed
    round-start structure); after = the shipped one-pass fused aggregate.
  * bfs_seed — the seed-init table bfs materializes before hop 1:
    before = full-V distinct + repartition + persist, then isin filter
    (replayed); after = the shipped filter-below-distinct form (never
    materializes V).

Usage: python tools/capture_plans_r6b.py [outdir]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
EDGES = os.path.join(REPO, ".bench_cache", "edges_bench.parquet")


def explain_to(df, path):
    s = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    with open(path, "w") as f:
        f.write(s)
    print("wrote", path)


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "plans", "r06")
    os.makedirs(outdir, exist_ok=True)
    from pyspark.sql import functions as F

    from scalemine_spark.session import get_spark
    from scalemine_spark.tuning import adaptive_partitions

    spark = get_spark("capture-plans-r6b", cores=CPUS, shuffle_partitions=2 * CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    from tools.profile_iter_r6 import ensure_edges

    ensure_edges(spark)
    edges = spark.read.parquet(EDGES).repartition(2 * CPUS, "src").persist()
    edges.count()
    p = adaptive_partitions(edges)

    # ---- pagerank verts: before (round-start two-pass) ------------------
    e = edges.select("src", "dst").repartition(p, "src") \
        .sortWithinPartitions("src").persist()
    verts_before = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id"))).distinct()
        .join(e.groupBy(F.col("src").alias("id")).agg(
            F.count("*").alias("out_deg")), "id", "left")
        .select("id", F.coalesce("out_deg", F.lit(0)).alias("out_deg"))
        .repartition(p, "id")
    )
    explain_to(verts_before, os.path.join(outdir, "pr_prepare_verts_before.txt"))

    # ---- pagerank verts: after (the SHIPPED _prepare) -------------------
    from scalemine_spark.algorithms.pagerank import _prepare
    e2, verts_after, _ = _prepare(edges, num_partitions=p)
    explain_to(verts_after, os.path.join(outdir, "pr_prepare_verts_after.txt"))

    # ---- bfs seed init: before (replayed full-V build + filter) ---------
    seeds = [int(r["src"]) for r in edges.limit(3).collect()]
    verts_full = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .repartition(p, "id")
        .persist()
    )
    seed_before = verts_full.filter(F.col("id").isin(seeds)).select(
        "id", F.lit(0).cast("long").alias("dist"))
    explain_to(seed_before, os.path.join(outdir, "bfs_seed_before.txt"))

    # ---- bfs seed init: after (shipped filter-below-distinct form) ------
    verts_lazy = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    seed_after = verts_lazy.filter(F.col("id").isin(seeds)).select(
        "id", F.lit(0).cast("long").alias("dist"))
    explain_to(seed_after, os.path.join(outdir, "bfs_seed_after.txt"))

    spark.stop()


if __name__ == "__main__":
    main()
