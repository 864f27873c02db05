"""G2 — connected components: large-star / small-star hash-to-min
(Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14)
[BASELINE.json:6,14].

State is a set of directed pointer edges (u, v) with v < u ("point to the
smaller id"). Each round:

  large-star(E): over the symmetrized neighborhood Γ(u), with
      m(u) = min(Γ(u) ∪ {u}),
    emit (v, m(u)) for every neighbor v > u.
  small-star(E): over pointer edges only (v ≤ u), with m(u) = min(N≤(u) ∪ {u}),
    emit (v, m(u)) for v ∈ N≤(u) ∪ {u}, v ≠ m(u).

Converges in O(log n) rounds to a star forest (child -> component-min root).
Convergence test: edge-set fingerprint (count + sum of xxhash64(u,v)) stable
across a round — one scalar action per round instead of a full set-difference
shuffle. Each round's output is checkpointed (atomic manifest, resume-safe)
which also truncates lineage.

Skew: groupBy(u).min is safe under power-law degrees thanks to partial
aggregation; the join fan-out back to neighbors is AQE-skew-split.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from scalemine_spark.checkpoint import CheckpointManager


def _fingerprint(e: DataFrame) -> tuple[int, int]:
    row = e.agg(
        F.count("*").alias("c"),
        F.bit_xor(F.xxhash64("u", "v")).alias("h"),
    ).collect()[0]
    return int(row["c"] or 0), int(row["h"] or 0)


def _large_star(e: DataFrame) -> DataFrame:
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
    mins = mins.select("u", F.least("u", "mn").alias("m"))
    # NO distinct here: the output has exactly one row per undirected input
    # pair (the v>u filter keeps one direction), so duplicates are only
    # value-level collisions. Small-star's groupBy(u).min absorbs them
    # map-side, and its own final distinct restores set semantics — dropping
    # this distinct removes a full-E exchange per round.
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
    )


def _small_star(e: DataFrame) -> DataFrame:
    # e is pointer-shaped: v < u for every row
    mins = e.groupBy("u").agg(F.min("v").alias("m"))
    nbrs = e.join(mins, "u").select(F.col("v").alias("u"), F.col("m").alias("v"))
    selfp = mins.select(F.col("u"), F.col("m").alias("v"))
    return nbrs.union(selfp).filter(F.col("u") != F.col("v")).distinct()


def connected_components(
    edges: DataFrame,
    max_rounds: int = 50,
    checkpointer: CheckpointManager | None = None,
    num_partitions: int | None = None,
) -> tuple[DataFrame, dict]:
    """Returns (components DF (id, comp) with comp = min id of the component,
    info dict). Includes isolated endpoints of self-loops."""
    spark = edges.sparkSession
    p = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))

    verts = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
        .repartition(p, "id")
        .persist()
    )

    # pointer-shaped initial edge set: (max, min) per undirected pair
    e = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.greatest("src", "dst").alias("u"),
            F.least("src", "dst").alias("v"),
        )
        .distinct()
    )

    start_round = 0
    if checkpointer is not None:
        last = checkpointer.latest()
        if last is not None:
            e = checkpointer.read_state(spark, last)
            start_round = last + 1

    fp = _fingerprint(e)
    t0 = time.monotonic()
    rounds = start_round
    converged = False
    round_secs: list[float] = []
    for r in range(start_round, max_rounds):
        t_r = time.monotonic()
        # materialize between the phases: small-star references the
        # large-star output three times (agg, join, self-pointers), so an
        # unmaterialized composition recomputes large-star 3x per round.
        ls = _large_star(e).localCheckpoint(eager=True)
        e2 = _small_star(ls)
        # convergence fingerprint rides the materializing action (Observation)
        obs = Observation(f"cc_fp_{r}")
        e2 = e2.observe(
            obs,
            F.count(F.lit(1)).alias("c"),
            F.bit_xor(F.xxhash64("u", "v")).alias("h"),
        )
        if checkpointer is not None:
            e2 = checkpointer.commit(
                r, e2, {"round_seconds": time.monotonic() - t_r, "edges": float(fp[0])}
            )
        else:
            # truncate every round: branching factor ~4/round (SURVEY §4.3.1)
            e2 = e2.localCheckpoint(eager=True)
        got = obs.get
        fp2 = (int(got["c"] or 0), int(got["h"] or 0))
        e = e2
        rounds = r + 1
        round_secs.append(time.monotonic() - t_r)
        if fp2 == fp:
            converged = True
            break
        fp = fp2

    comps = (
        verts.join(e.select(F.col("u").alias("id"), F.col("v").alias("root")), "id", "left")
        .select("id", F.coalesce("root", "id").alias("comp"))
    )
    info = {
        "rounds": rounds,
        "converged": converged,
        "seconds": time.monotonic() - t0,
        "round_seconds": round_secs,
        "n_pointer_edges": fp[0],
    }
    verts.unpersist()
    return comps, info
