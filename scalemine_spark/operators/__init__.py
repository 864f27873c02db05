from scalemine_spark.operators.joins import asof_join, salted_join

__all__ = ["salted_join", "asof_join"]
