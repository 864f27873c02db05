"""G3 — synchronous label propagation [BASELINE.json:6,14].

Semantics (normative, SURVEY §2 G3): undirected graph; label_0(v) = v;
each iteration every vertex adopts the most frequent label among its
neighbors' previous labels, ties broken by the SMALLEST label
(deterministic — exact-match acceptance requires it). Isolated vertices
keep their label. Runs a fixed number of iterations or until fixpoint
(no label changed).

Kernel (SURVEY A6): groupBy(id, label).count() then
max(struct(cnt, -label)) — lexicographic struct max == (max count,
then min label) — all JVM-side, no window shuffle needed.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from scalemine_spark.checkpoint import CheckpointManager


def label_propagation(
    edges: DataFrame,
    iters: int | None = None,
    max_iters: int = 20,
    checkpointer: CheckpointManager | None = None,
    num_partitions: int | None = None,
) -> tuple[DataFrame, dict]:
    """Returns (labels DF (id, label), info). iters=None -> run to fixpoint
    (bounded by max_iters); iters=k -> exactly k synchronous iterations."""
    from scalemine_spark.tuning import adaptive_partitions

    spark = edges.sparkSession
    # scale-adaptive loop width (round 6, guide §2) — same derivation and
    # rationale as pagerank._prepare / tuning.py module docstring
    p = num_partitions or adaptive_partitions(edges)

    # partitioned AND sorted once: the per-iteration sym⋈labels sort-merge
    # join reuses the cached ordering instead of re-sorting 2E rows per round.
    # Round 6 (guide §2.4 — share one exchange): symmetrize()'s distinct
    # paid its own (src,dst) exchange and the repartition a SECOND full-2E
    # exchange; repartitioning FIRST on dst lets the dedup run in place —
    # hash(dst) clusters every (src,dst) pair, so the aggregate's required
    # ClusteredDistribution(src,dst) is already satisfied (the subset rule)
    # and the cache build shuffles the 2E rows exactly once. Same rows,
    # same partitioning and ordering as the round-5 cache.
    e0 = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    sym = (
        e0.union(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .repartition(p, "dst")
        .dropDuplicates(["src", "dst"])
        .sortWithinPartitions("dst")
        .persist()
    )
    # vertices come from the RAW edge endpoints (not sym, which drops
    # self-loops): a vertex appearing only in self-loop edges still exists and
    # keeps its own label throughout — consistent with pagerank / components.
    verts = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
        .repartition(p, "id")
        .persist()
    )

    start = 0
    labels = None
    if checkpointer is not None:
        last = checkpointer.latest()
        if last is not None:
            labels = checkpointer.read_state(spark, last)
            start = last + 1
    if labels is None:
        labels = verts.select("id", F.col("id").alias("label"))

    total = iters if iters is not None else max_iters
    t0 = time.monotonic()
    it = start
    changed = -1
    while it < total:
        t_it = time.monotonic()
        # neighbor labels: edge (src,dst) brings label(dst) to src
        nbr = sym.join(
            labels.select(F.col("id").alias("dst"), "label"), "dst"
        ).select(F.col("src").alias("id"), "label")
        # Two-level aggregate, partial-agg both levels. (A round-3 experiment
        # replaced this with one repartition(id) serving both groupBys
        # exchange-free; measured SLOWER at bench scale — once labels start
        # converging, neighbor labels repeat heavily and the (id,label)
        # partial aggregate collapses most of the 2E rows map-side, which the
        # blind repartition forfeits. Keep the partial-agg form.)
        counts = nbr.groupBy("id", "label").agg(F.count("*").alias("cnt"))
        new = counts.groupBy("id").agg(
            F.max(F.struct(F.col("cnt"), (-F.col("label")).alias("neg"))).alias("m")
        ).select("id", (-F.col("m.neg")).alias("new_label"))
        # previous label rides along as `prev` -> changed-count is a scan-agg
        new_labels = (
            labels.join(new, "id", "left")
            .select(
                "id",
                F.coalesce("new_label", "label").alias("label"),
                F.col("label").alias("prev"),
            )
        )

        # changed-count rides the materializing action (Observation):
        # one Spark job per iteration.
        obs = Observation(f"lpa_changed_{it}")
        new_labels = new_labels.observe(
            obs,
            F.sum(F.when(F.col("label") != F.col("prev"), 1).otherwise(0)).alias("changed"),
        )
        if checkpointer is not None:
            committed = checkpointer.commit(it, new_labels, {})
        else:
            # truncate every iteration (branching plan growth, SURVEY §4.3.1)
            committed = new_labels.localCheckpoint(eager=True)

        changed = int(obs.get["changed"] or 0)
        if checkpointer is not None:
            checkpointer.amend_metrics(
                it, {"changed": float(changed), "iter_seconds": time.monotonic() - t_it}
            )
        labels = committed
        it += 1
        if iters is None and changed == 0:
            break

    info = {"iters": it, "seconds": time.monotonic() - t0, "last_changed": changed}
    labels = labels.select("id", "label")
    sym.unpersist()
    verts.unpersist()
    return labels, info
