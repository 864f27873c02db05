from scalemine_spark.operators.joins import (
    asof,
    asof_join,
    asof_join_merge,
    salted_join,
)
from scalemine_spark.operators.similarity import (
    ann_ivf,
    ann_lsh,
    cosine_topk,
    kmeans_codebook,
)
from scalemine_spark.operators.text import tfidf_topk

__all__ = [
    "salted_join",
    "asof",
    "asof_join",
    "asof_join_merge",
    "cosine_topk",
    "ann_lsh",
    "ann_ivf",
    "kmeans_codebook",
    "tfidf_topk",
]
