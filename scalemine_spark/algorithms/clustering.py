"""G11 — local clustering coefficient [BASELINE.json north_rule: link-graph
analytics over the edge table; web-graph relevance: hub neighborhoods with
near-zero clustering are a classic link-farm / spam signal, high clustering
marks topical communities].

Semantics (normative): on the canonical undirected simple view,
cc(v) = triangles(v) / C(deg(v), 2), with cc(v) = 0.0 when deg(v) < 2.
deg(v) = number of distinct undirected neighbors.

Scale plan (100 TB): a pure composition of two already-scale-audited
pieces — G4b's degree-ordered per-vertex triangle count (no quadratic hub
blow-up) and A2's partial-agg degree count — closed by one V-sized join
and a codegen'd arithmetic projection. No new shuffle shape; the division
is a single double op on exact integers, so results are deterministic
under any merge order (we still round to 9dp to keep the oracle dtype
contract explicit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from scalemine_spark.algorithms.triangles import triangles_per_vertex
from scalemine_spark.graph import canonical_undirected


def clustering_coefficient(edges: DataFrame) -> DataFrame:
    """(id, deg, triangles, cc) for every vertex; cc rounded to 9dp."""
    und = canonical_undirected(edges)
    deg = (
        und.select(F.col("a").alias("id"))
        .unionAll(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    tri = triangles_per_vertex(edges)
    return deg.join(tri, "id").select(
        "id",
        "deg",
        "triangles",
        F.round(
            F.when(
                F.col("deg") >= 2,
                F.lit(2.0)
                * F.col("triangles")
                / (F.col("deg") * (F.col("deg") - F.lit(1))),
            ).otherwise(F.lit(0.0)),
            9,
        ).alias("cc"),
    )
