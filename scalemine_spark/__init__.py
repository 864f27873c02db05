"""scalemine_spark — a from-scratch PySpark-native link-graph analytics engine.

Capability bar: ehab-abdelhamid/ScaleMine (scalable single-large-graph analytics
with explicit skew/load-balance handling; see SURVEY.md §0 — the reference
checkout was empty in this sandbox, so citations are to BASELINE.json and the
published ScaleMine paper, SC '16).

This is NOT a port: the engine is declarative PySpark (DataFrame/SQL/Catalyst)
end-to-end. Stages (BASELINE.json north_rule):

  A. extraction  — vectorized Arrow/pandas UDFs: html -> byte-identical text,
                   html -> normalized href edges            (scalemine_spark.extract)
  B. graph       — salted, degree-bucketed edge table       (scalemine_spark.graph)
  C. algorithms  — PageRank / connected components / label propagation /
                   triangle count as iterative DataFrame jobs with explicit
                   repartitioning, hub broadcast, skew salting
                                                            (scalemine_spark.algorithms)
  Ops            — Iceberg-style per-iteration checkpoint manifests; resume
                   mid-algorithm                            (scalemine_spark.checkpoint)
"""

__version__ = "0.1.0"
