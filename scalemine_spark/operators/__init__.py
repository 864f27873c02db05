from scalemine_spark.operators.joins import asof_join, asof_join_merge, salted_join

__all__ = ["salted_join", "asof_join", "asof_join_merge"]
