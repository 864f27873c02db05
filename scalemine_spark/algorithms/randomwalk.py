"""G12 — deterministic random-walk sampling (DeepWalk/node2vec corpus
generation) [training-data-pipeline mandate: walk corpora are the standard
input for graph-embedding training; BASELINE.json north_rule: link-graph
analytics over the edge table].

Semantics (normative): adjacency is the DEDUPLICATED (src, dst) edge set
with neighbors ranked by ascending dst (rank 0-based). From each seed s we
start `walks_per_seed` walks; walk (s, w) at vertex `cur` on step `t`
moves to the neighbor with rank

    r = (pmod(cur, 1000003)*31 + pmod(s, 1000003)*17 + w*7 + t*13) mod outdeg(cur)

— a fixed integer hash mix, NOT entropy: the whole walk corpus is a pure
function of (edges, seeds, walks_per_seed, length), so runs replay
bitwise, the DuckDB oracle can unroll the identical arithmetic, and a
resharded/rescaled cluster produces the identical corpus. All mix terms
are bounded (pmod caps the id terms at ~1e6) so the arithmetic never
overflows ANSI BIGINT. A walk that reaches a vertex with outdegree 0
stops (no further rows). Output: (seed, walk, step, vertex) — step 0 is
the seed itself.

Scale plan (100 TB): the ranked adjacency (src, rank, dst) is built
once — one window rank + one partial-agg count — partitioned AND sorted
on (src, rank), persisted; outdeg likewise on src. Each step is TWO
narrow-key equi-joins driven by the frontier (frontier ⋈ outdeg on src
to compute the chosen rank, then (cur, rank) ⋈ adjacency on BOTH keys),
so a hub of degree D costs one row lookup per walker, never a D-row
fan-out — and because the cached big sides already satisfy the joins'
required distribution and ordering, only the walker-sized frontier
shuffles per step; the E-sized side is never re-exchanged or re-sorted
(first cut cached on src alone and measured 1.8x slower at 60M/local[32]
from the per-step E re-shuffle — BENCH/new_algos_r5.json). Frontier size
is monotonically non-increasing (walks die at dead ends, never branch),
and steps are short (length ~ 10-80 for embedding corpora); lineage is
truncated per step.
"""

from __future__ import annotations

import time
from collections.abc import Sequence

from pyspark.sql import DataFrame, Observation, Window
from pyspark.sql import functions as F

from scalemine_spark.tuning import adaptive_partitions

_MIX_P = 1000003  # bounds the id terms so the mix never overflows BIGINT


def _chosen_rank(cur, seed, walk, step: int):
    mix = (
        F.pmod(cur, F.lit(_MIX_P)) * 31
        + F.pmod(seed, F.lit(_MIX_P)) * 17
        + walk * 7
        + F.lit(step) * 13
    )
    return F.pmod(mix, F.col("od"))


def random_walks(
    edges: DataFrame,
    seeds: Sequence[int],
    length: int = 10,
    walks_per_seed: int = 1,
    num_partitions: int | None = None,
) -> tuple[DataFrame, dict]:
    """Returns ((seed, walk, step, vertex) DF, info). Deterministic."""
    spark = edges.sparkSession
    # scale-adaptive loop width (round 6, guide §2) — same derivation and
    # rationale as pagerank._prepare / tuning.py module docstring
    p = num_partitions or adaptive_partitions(edges)

    adj = edges.select("src", "dst").distinct()
    # partition the persisted adjacency on BOTH join keys: the per-step
    # lookup joins on (cur, rnk), and a cache partitioned on src alone
    # would re-shuffle all E rows EVERY step (measured at 60M/local[32]:
    # ~25s/step before, see BENCH/new_algos_r5.json) — with hash(src, rnk)
    # the big side's output partitioning satisfies the join requirement
    # and only the frontier shuffles per step. Same for the V-sized odeg.
    ranked = (
        adj.withColumn(
            "rnk",
            F.row_number().over(Window.partitionBy("src").orderBy("dst")) - 1,
        )
        .repartition(p, "src", "rnk")
        .sortWithinPartitions("src", "rnk")
        .persist()
    )
    odeg = (
        adj.groupBy("src")
        .agg(F.count("*").alias("od"))
        .repartition(p, "src")
        .sortWithinPartitions("src")
        .persist()
    )
    # A broadcast-frontier variant (hinting the walker side into both
    # joins) was A/B'd at 60M/100k walkers and measured no faster than
    # this shuffle path (BENCH/new_algos_r5.json: the cached-E probe scan
    # dominates either way, and the per-step driver collect adds cost);
    # production walker counts exceed any broadcast budget anyway, so the
    # shuffle plan is the only one kept.

    walks = spark.range(walks_per_seed).select(
        F.col("id").cast("int").alias("walk")
    )
    seed_df = (
        edges.sparkSession.createDataFrame(
            [(int(s),) for s in seeds], "seed long"
        )
        .crossJoin(walks)
    )
    frontier = seed_df.select(
        "seed", "walk", F.col("seed").alias("cur")
    ).localCheckpoint(eager=True)

    out = [
        frontier.select(
            "seed", "walk", F.lit(0).alias("step"), F.col("cur").alias("vertex")
        )
    ]
    frontier_sizes = []
    t0 = time.monotonic()
    for t in range(length):
        # phase 1: chosen rank from the walker's own state + outdeg only
        # (broadcast-sized frontier ⋈ odeg on src — no neighbor fan-out)
        stepped = frontier.join(
            odeg.withColumnRenamed("src", "cur"), "cur"
        ).select(
            "seed",
            "walk",
            "cur",
            _chosen_rank(F.col("cur"), F.col("seed"), F.col("walk"), t).alias(
                "rnk"
            ),
        )
        # phase 2: pure two-key equi-join picks exactly one neighbor row
        nxt = stepped.join(
            ranked.select(
                F.col("src").alias("cur"), "rnk", F.col("dst").alias("vertex")
            ),
            ["cur", "rnk"],
        ).select("seed", "walk", "vertex")
        # frontier size rides the materializing localCheckpoint as an
        # Observation — ONE Spark job per step instead of checkpoint+count
        # (the G1/G2/G7 rule; round-5 verdict "what's wrong" #3)
        obs = Observation(f"walk_n_{t}")
        frontier = (
            nxt.select("seed", "walk", F.col("vertex").alias("cur"))
            .observe(obs, F.count(F.lit(1)).alias("n"))
            .localCheckpoint(eager=True)
        )
        n = int(obs.get["n"] or 0)
        frontier_sizes.append(n)
        out.append(
            frontier.select(
                "seed",
                "walk",
                F.lit(t + 1).alias("step"),
                F.col("cur").alias("vertex"),
            )
        )
        if n == 0:
            break

    corpus = out[0]
    for o in out[1:]:
        corpus = corpus.unionAll(o)
    info = {
        "steps_run": len(frontier_sizes),
        "frontier_sizes": frontier_sizes,
        "seconds": time.monotonic() - t0,
    }
    ranked.unpersist()
    odeg.unpersist()
    return corpus, info
