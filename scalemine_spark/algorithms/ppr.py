"""G8 — personalized PageRank (random walk with restart to a seed set) as
an iterative DataFrame job [BASELINE.json north_rule: link-graph analytics
over the edge table; same iterative contract as G1: one persisted
src-partitioned edge cache, fused Observation stats, one Spark job per
iteration, lineage truncated every iteration, checkpoint/resume].

Semantics (normative): seed set S (the personalization vector is uniform
over S), damping d. With tele(v) = 1/|S ∩ V| for v ∈ S else 0:

    r_0(v)     = tele(v)
    r_{t+1}(v) = (1-d)·tele(v) + d·dangling_t·tele(v) + d·Σ_{u→v} r_t(u)/outdeg(u)
    dangling_t = Σ_{outdeg(u)=0} r_t(u)

i.e. both the restart mass and the dangling mass return to the SEED SET
(not uniformly to all vertices) — the standard personalized variant used
for seed-expansion / related-page queries on web graphs. Vertices outside
S that are unreachable from S keep rank exactly 0.0.

Scale notes: the per-iteration plan is the same SpMV join + partial-agg
sum as global PageRank (the edge cache shuffles once, up front); the seed
set is embedded as an `isin` literal filter — callers pass a HANDFUL to a
few thousand seeds (the PPR use case); beyond ~100k seeds a broadcast-join
teleport table would be the right form, and this function refuses rather
than silently building a megabyte-scale plan literal. exact_sums follows
pagerank's contract: True = decimal(38,18) accumulation, merge-order-free
bit-identical replay (2.3-3x slower, BENCH/ab_exact_sums.json); False
(default) = double sums, replay contract allclose 1e-12.
"""

from __future__ import annotations

import time
from collections.abc import Sequence

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from scalemine_spark.algorithms.pagerank import _prepare
from scalemine_spark.checkpoint import CheckpointManager

_MAX_SEED_LITERALS = 100_000


def personalized_pagerank(
    edges: DataFrame,
    sources: Sequence[int],
    d: float = 0.85,
    tol: float = 1e-8,
    max_iters: int = 100,
    fixed_iters: int | None = None,
    checkpointer: CheckpointManager | None = None,
    num_partitions: int | None = None,
    exact_sums: bool = False,
) -> tuple[DataFrame, dict]:
    """Returns (ranks DF (id, rank), info dict)."""
    seeds = sorted(set(int(s) for s in sources))
    if not seeds:
        raise ValueError("personalized_pagerank needs a non-empty seed set")
    if len(seeds) > _MAX_SEED_LITERALS:
        raise ValueError(
            f"{len(seeds)} seeds exceeds the isin-literal budget "
            f"({_MAX_SEED_LITERALS}); join a teleport table instead"
        )

    spark = edges.sparkSession
    e, verts, p = _prepare(edges, num_partitions)

    def _s(col):  # sum, optionally in exact (associative) decimal
        if exact_sums:
            return F.sum(col.cast("decimal(38,18)")).cast("double")
        return F.sum(col)

    is_seed = F.col("id").isin(seeds)
    n_seed = verts.filter(is_seed).count()
    if n_seed == 0:
        raise ValueError("none of the seeds exist in the graph")
    tele = F.when(is_seed, F.lit(1.0 / n_seed)).otherwise(F.lit(0.0))

    start_iter = 0
    state = None
    dangling = None
    if checkpointer is not None:
        last = checkpointer.latest()
        if last is not None:
            state = checkpointer.read_state(spark, last)  # (id, out_deg, rank)
            dangling = checkpointer.read_manifest(last)["metrics"]["dm"]
            start_iter = last + 1
    if state is None:
        state = verts.select("id", "out_deg", tele.alias("rank")).localCheckpoint(
            eager=True
        )

    if dangling is None:
        scal = state.agg(
            _s(F.when(F.col("out_deg") == 0, F.col("rank")).otherwise(0.0)).alias("dm")
        ).collect()[0]
        dangling = float(scal["dm"] or 0.0)

    total_iters = fixed_iters if fixed_iters is not None else max_iters
    deltas: list[float] = []
    t0 = time.monotonic()
    it = start_iter
    while it < total_iters:
        w = state.filter(F.col("out_deg") > 0).select(
            F.col("id").alias("src"), (F.col("rank") / F.col("out_deg")).alias("w")
        )
        contribs = e.join(w, "src").groupBy("dst").agg(_s(F.col("w")).alias("contrib"))
        restart = (1.0 - d) + d * dangling  # mass returning to the seed set
        new_state = state.join(contribs, state.id == contribs.dst, "left").select(
            "id",
            "out_deg",
            (tele * F.lit(restart) + d * F.coalesce(F.col("contrib"), F.lit(0.0))).alias(
                "rank"
            ),
            F.col("rank").alias("pr"),
        )
        obs = Observation(f"ppr_stats_{it}")
        new_state = new_state.observe(
            obs,
            _s(F.abs(F.col("rank") - F.col("pr"))).alias("l1"),
            _s(F.when(F.col("out_deg") == 0, F.col("rank")).otherwise(0.0)).alias("dm"),
        )
        new_state = new_state.select("id", "out_deg", "rank")
        if checkpointer is not None:
            state = checkpointer.commit(it, new_state, {})
        else:
            state = new_state.localCheckpoint(eager=True)
        st = obs.get
        delta = float(st["l1"] or 0.0)
        dangling = float(st["dm"] or 0.0)
        if checkpointer is not None:
            checkpointer.amend_metrics(it, {"dm": dangling, "l1_delta": delta})
        deltas.append(delta)
        it += 1
        if fixed_iters is None and delta < tol:
            break

    info = {
        "iters_run": it - start_iter,
        "deltas": deltas,
        "n_seeds": n_seed,
        "seconds": time.monotonic() - t0,
    }
    e.unpersist()
    verts.unpersist()
    return state.select("id", "rank"), info
