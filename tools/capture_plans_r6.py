"""Capture .explain('formatted') before/after plans for the round-6
optimization deliverable (plans/r06/).

For the non-iterative sections (extract, triangles, q_*) bench_extra.py
already captures the live plan. This tool captures the ITERATIVE sections'
steady-state per-iteration plan, which never appears as a single query:

  * pagerank_iter   — the new_state plan of one steady iteration
  * lpa_iter        — one LPA iteration's new_labels plan
  * hits_iter       — one HITS iteration's combined plan (after: ONE tree
                      containing both half-steps; before: the a_mat
                      localCheckpoint split the iteration into two trees,
                      reconstructed here from the round-start structure)
  * cc_round        — one large/small-star round's output plan

"before" variants emulate the round-start behavior through parameters
(num_partitions = 2*CPUS = the old session-conf width) or by replaying the
round-start operator structure inline; "after" runs the shipped code path.

Usage: python tools/capture_plans_r6.py [outdir]
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

    spark = get_spark("capture-plans-r6", cores=CPUS, shuffle_partitions=2 * CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    from tools.profile_iter_r6 import ensure_edges

    ensure_edges(spark)
    edges = spark.read.parquet(EDGES).repartition(2 * CPUS, "src").persist()
    edges.count()

    for tag, p in (("before", 2 * CPUS), ("after", adaptive_partitions(edges))):
        # ---- pagerank: one steady iteration --------------------------
        e = edges.select("src", "dst").repartition(p, "src") \
            .sortWithinPartitions("src").persist()
        verts = (
            e.select(F.col("src").alias("id"))
            .union(e.select(F.col("dst").alias("id"))).distinct()
            .join(e.groupBy(F.col("src").alias("id")).agg(
                F.count("*").alias("out_deg")), "id", "left")
            .select("id", F.coalesce("out_deg", F.lit(0)).alias("out_deg"))
            .repartition(p, "id").persist()
        )
        n = verts.count()
        state = verts.withColumn("rank", F.lit(1.0 / n)).localCheckpoint(eager=True)
        w = state.filter(F.col("out_deg") > 0).select(
            F.col("id").alias("src"), (F.col("rank") / F.col("out_deg")).alias("w"))
        contribs = e.join(w, "src").groupBy("dst").agg(F.sum("w").alias("contrib"))
        new_state = (
            state.join(contribs, state.id == contribs.dst, "left")
            .select("id", "out_deg",
                    (F.lit(0.1) + 0.85 * F.coalesce(F.col("contrib"), F.lit(0.0))).alias("rank"))
        )
        explain_to(new_state, os.path.join(outdir, f"pagerank_iter_{tag}.txt"))

        # ---- lpa: one iteration --------------------------------------
        if tag == "before":
            # round-start cache build: distinct exchange + repartition
            from scalemine_spark.graph import symmetrize
            sym = symmetrize(edges).repartition(p, "dst") \
                .sortWithinPartitions("dst").persist()
        else:
            # shipped round-6 build: one exchange, dedup in place
            e0 = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
            sym = (
                e0.union(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
                .repartition(p, "dst")
                .dropDuplicates(["src", "dst"])
                .sortWithinPartitions("dst")
                .persist()
            )
        labels = verts.select("id", F.col("id").alias("label")).localCheckpoint(eager=True)
        nbr = sym.join(labels.select(F.col("id").alias("dst"), "label"), "dst") \
            .select(F.col("src").alias("id"), "label")
        counts = nbr.groupBy("id", "label").agg(F.count("*").alias("cnt"))
        new = counts.groupBy("id").agg(
            F.max(F.struct(F.col("cnt"), (-F.col("label")).alias("neg"))).alias("m")
        ).select("id", (-F.col("m.neg")).alias("new_label"))
        new_labels = labels.join(new, "id", "left").select(
            "id", F.coalesce("new_label", "label").alias("label"))
        explain_to(new_labels, os.path.join(outdir, f"lpa_iter_{tag}.txt"))

        # ---- hits: one iteration -------------------------------------
        e_by_src = edges.select("src", "dst").repartition(p, "src") \
            .sortWithinPartitions("src", "dst").persist()
        e_by_dst = edges.select("src", "dst").repartition(p, "dst") \
            .sortWithinPartitions("dst", "src").persist()
        hub = verts.select("id", F.lit(1.0).alias("hub"))
        a_raw = (
            e_by_src.join(hub.withColumnRenamed("id", "src"), "src")
            .groupBy("dst").agg(F.sum("hub").alias("auth_raw"))
            .withColumnRenamed("dst", "id")
        )
        if tag == "before":
            # round-start structure: a_mat was an EAGER localCheckpoint —
            # the iteration ran as TWO materializing jobs
            a_mat = a_raw.localCheckpoint(eager=True)
        else:
            a_mat = a_raw.persist()
        h_raw = (
            e_by_dst.join(a_mat.withColumnRenamed("id", "dst"), "dst")
            .groupBy("src").agg(F.sum("auth_raw").alias("hub_raw"))
            .withColumnRenamed("src", "id")
        )
        combined = (
            verts.join(a_mat, "id", "left").join(h_raw, "id", "left")
            .select("id", F.coalesce("auth_raw", F.lit(0.0)).alias("auth_raw"),
                    F.coalesce("hub_raw", F.lit(0.0)).alias("hub_raw"))
        )
        explain_to(combined, os.path.join(outdir, f"hits_iter_{tag}.txt"))

        # ---- cc: one star round --------------------------------------
        from scalemine_spark.algorithms.components import _cc_round
        sp_saved = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(p))
        ecc = edges.filter(F.col("src") != F.col("dst")).select(
            F.greatest("src", "dst").alias("u"), F.least("src", "dst").alias("v"))
        out, ls = _cc_round(ecc)
        explain_to(out, os.path.join(outdir, f"cc_round_{tag}.txt"))
        spark.conf.set("spark.sql.shuffle.partitions", sp_saved)

        e.unpersist(); verts.unpersist(); sym.unpersist()
        e_by_src.unpersist(); e_by_dst.unpersist()
        if tag == "after":
            a_mat.unpersist()
        spark.catalog.clearCache()
        edges.persist(); edges.count()
    spark.stop()


if __name__ == "__main__":
    main()
