"""Inspect the per-iteration PageRank physical plan: count exchanges and
check partitioning preservation through the localCheckpoint boundary.

Usage: python tools/explain_pagerank.py [edges_parquet] [cores]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from scalemine_spark.graph import out_degrees, vertex_ids
from scalemine_spark.session import get_spark


def main():
    edges_path = sys.argv[1] if len(sys.argv) > 1 else ".bench_cache/edges_n270000.parquet"
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    p = 2 * cores
    spark = get_spark("explain-pr", cores=cores, shuffle_partitions=p)
    spark.sparkContext.setLogLevel("ERROR")

    e = spark.read.parquet(edges_path).repartition(p, "src").persist()
    e.count()
    verts = (
        vertex_ids(e)
        .join(out_degrees(e), "id", "left")
        .select("id", F.coalesce("out_deg", F.lit(0)).alias("out_deg"))
        .repartition(p, "id")
        .persist()
    )
    n = verts.count()
    state = verts.withColumn("rank", F.lit(1.0 / n)).localCheckpoint(eager=True)

    for it in range(3):
        t0 = time.monotonic()
        w = state.filter(F.col("out_deg") > 0).select(
            F.col("id").alias("src"), (F.col("rank") / F.col("out_deg")).alias("w")
        )
        contribs = e.join(w, "src").groupBy("dst").agg(F.sum("w").alias("contrib"))
        base_df = spark.createDataFrame([(0.15 / n,)], "base double")
        new_state = (
            state.join(contribs, state.id == contribs.dst, "left")
            .crossJoin(F.broadcast(base_df))
            .select(
                "id",
                "out_deg",
                (F.col("base") + 0.85 * F.coalesce(F.col("contrib"), F.lit(0.0))).alias("rank"),
                F.col("rank").alias("pr"),
            )
        )
        committed = new_state.localCheckpoint(eager=True)
        dt = time.monotonic() - t0
        plan = new_state._jdf.queryExecution().executedPlan().toString()
        n_ex = plan.count("Exchange hashpartitioning")
        n_bc = plan.count("BroadcastExchange")
        n_aqe = plan.count("ShuffleQueryStage")
        print(f"iter {it}: {dt:.2f}s exchanges={n_ex} broadcasts={n_bc} stages={n_aqe}")
        if it == 0:
            print(plan[:4000])
        state = committed
    spark.stop()


if __name__ == "__main__":
    main()
