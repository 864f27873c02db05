"""G13 — Adamic-Adar link prediction [north_rule domain: link-graph
analytics; classic related-page / suggested-link scoring on web graphs].

Semantics (normative): on the canonical undirected simple view with
degrees deg(w), every wedge center w contributes 1/ln(deg(w)) to each
unordered pair (u, v), u < v, of its neighbors; pairs that are already
edges are dropped (we score candidate links, not existing ones). Output:
top-k pairs by (score DESC, u ASC, v ASC) — the id tie-break makes the
cut exactly deterministic; scores rounded to 9dp.

Scale plan (100 TB): the pair generation is one self-join of the
adjacency on the center — inherently Θ(Σ deg(w)²), the same quadratic
wedge mass the triangle counter dodges with degree orientation. AA
cannot dodge it exactly (every neighbor pair needs the contribution),
so the standard production mitigation is exposed as
``max_center_degree``: centers above the cap are EXCLUDED (documented
approximation — a degree-10⁶ hub contributes 1/ln(10⁶) ≈ 0.07 to 10¹²
pairs; dropping it loses a near-constant offset on pairs that almost
all never surface in the top-k). With the cap, pair mass is bounded by
cap × E. The per-pair SUM partial-aggregates map-side; the
already-an-edge drop is a left-anti join on the canonical pair; the
top-k is a TakeOrdered, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from scalemine_spark.graph import canonical_undirected


def adamic_adar(
    edges: DataFrame,
    k: int = 100,
    max_center_degree: int | None = None,
    exact_weights: bool = False,
) -> DataFrame:
    """Top-k candidate links.

    exact_weights=False (default): (u, v, score) with the textbook double
    score, rounded to 9dp. Double summation is shuffle-merge-order
    dependent, so a replay (or an independent oracle) can land 1 ulp off
    and flip the 9th decimal at a rounding boundary — fine for ranking,
    not for value-level replay.
    exact_weights=True: (u, v, score_n) where each center contributes the
    INTEGER nano-weight floor(1e9/ln(deg)) and score_n is their BIGINT
    sum — integer addition is associative, so the result (including the
    top-k cut) is exactly deterministic under any merge order, and
    floor(1e9/ln(deg)) was verified bit-identical between Spark (Java
    Math.log) and DuckDB for every degree up to 200k. This is the
    driver-row contract (g13), same trick family as G6/G8's fixed-iter
    unrolling. score = score_n * 1e-9 to within one nano per center.
    """
    und = canonical_undirected(edges)  # (a, b), a < b, distinct
    adj = und.select(F.col("a").alias("w"), F.col("b").alias("n")).unionAll(
        und.select(F.col("b").alias("w"), F.col("a").alias("n"))
    )
    deg = adj.groupBy("w").agg(F.count("*").alias("deg"))
    centers = deg.filter(F.col("deg") >= 2)
    if max_center_degree is not None:
        centers = centers.filter(F.col("deg") <= max_center_degree)
    if exact_weights:
        c = F.floor(F.lit(1e9) / F.log(F.col("deg"))).cast("long")
    else:
        c = F.lit(1.0) / F.log(F.col("deg"))
    a1 = adj.join(centers, "w").select("w", F.col("n").alias("u"), c.alias("c"))
    a2 = adj.select("w", F.col("n").alias("v"))
    pairs = a1.join(a2, "w").filter(F.col("u") < F.col("v"))
    scored = pairs.groupBy("u", "v").agg(F.sum("c").alias("s"))
    cand = scored.join(
        und.select(F.col("a").alias("u"), F.col("b").alias("v")),
        ["u", "v"],
        "left_anti",
    )
    if exact_weights:
        out = cand.select("u", "v", F.col("s").alias("score_n"))
        return out.orderBy(F.col("score_n").desc(), "u", "v").limit(k)
    out = cand.select("u", "v", F.round("s", 9).alias("score"))
    return out.orderBy(F.col("score").desc(), "u", "v").limit(k)
