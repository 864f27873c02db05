"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship: synthesize the mandated Common-Crawl-style pages
                table at sf0.001 scale, extract edges with the vectorized
                Stage-A UDFs, run 5 PageRank iterations, return top-10.
queries()     — one entry per implemented operator row of SURVEY.md §2
                (registry lives in scalemine_spark.queries).
oracle_sql()  — matching DuckDB SQL per query where SQL-expressible.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_REPO = os.path.dirname(os.path.abspath(__file__))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from scalemine_spark.algorithms import pagerank
    from scalemine_spark.extract import extract_edges
    from scalemine_spark.fixtures import materialize_pages

    ppath, _ = materialize_pages(
        "/root/testdata/sf0.001/documents.parquet",
        os.path.join(_REPO, ".cache"),
        n_pages=2000,
        seed=42,
    )
    pages = spark.read.parquet(ppath)
    edges = extract_edges(pages)
    ranks, _info = pagerank(edges, fixed_iters=5)
    return ranks.orderBy(F.desc("rank"), "id").limit(10)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from scalemine_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from scalemine_spark.queries import ORACLES

    return dict(ORACLES)
