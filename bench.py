#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line.

Runs the engine's headline pipeline at bench scale on local[$SPARK_GRAFT_CPUS]:
  1. extract      — synthetic Common-Crawl-style pages -> edge table
                    (Stage A, vectorized pandas UDFs; pages generation itself
                    is cached and NOT timed, extraction is)
  2. pagerank10   — 10 fixed power iterations (the SpMV-throughput metric)
  3. cc           — large-star/small-star to convergence
  4. lpa3         — 3 synchronous label-propagation iterations
  5. triangles    — degree-ordered wedge-join count
plus three relational headliners at $SPARK_GRAFT_SF_DIR:
  6. q_tpch1      — TPC-H-Q1-shaped aggregation on lineitem
  7. q_join       — orders x customer join+agg
  8. q_cosine     — brute-force cosine top-k over embeddings

Headline metric: PageRank SpMV throughput in edges/sec (BASELINE.json:2).
The scaling-efficiency protocol (local[8] vs local[32]) reuses this file via
SPARK_GRAFT_CPUS — see BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_PAGES = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "135000"))  # ~2M edges


def main() -> None:
    from pyspark.sql import functions as F

    from scalemine_spark.algorithms import (
        connected_components,
        label_propagation,
        pagerank,
        triangle_count,
    )
    from scalemine_spark.extract import extract_edges
    from scalemine_spark.fixtures import materialize_pages
    from scalemine_spark.session import get_spark

    spark = get_spark("scalemine-bench", cores=CPUS, shuffle_partitions=2 * CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else -1.0

    # ---- Stage A: pages -> edges (generation cached, extraction timed) ----
    ppath, _ = materialize_pages(
        f"{SF_DIR}/documents.parquet", os.path.join(REPO, ".cache"), n_pages=BENCH_PAGES, seed=42
    )
    pages = spark.read.parquet(ppath)
    t0 = time.monotonic()
    edges = extract_edges(pages)
    edges = edges.repartition(2 * CPUS, "src").persist()
    n_edges = edges.count()
    timings["extract"] = time.monotonic() - t0

    # ---- graph algorithms ----
    t0 = time.monotonic()
    ranks, pr_info = pagerank(edges, fixed_iters=10)
    ranks.agg(F.sum("rank")).collect()
    timings["pagerank10"] = time.monotonic() - t0
    pr_eps = n_edges * 10 / timings["pagerank10"]

    t0 = time.monotonic()
    comps, cc_info = connected_components(edges)
    comps.agg(F.countDistinct("comp")).collect()
    timings["cc"] = time.monotonic() - t0
    cc_eps = n_edges * cc_info["rounds"] / timings["cc"]

    t0 = time.monotonic()
    labels, _ = label_propagation(edges, iters=3)
    labels.agg(F.countDistinct("label")).collect()
    timings["lpa3"] = time.monotonic() - t0

    t0 = time.monotonic()
    n_tri = triangle_count(edges).collect()[0]["triangles"]
    timings["triangles"] = time.monotonic() - t0

    # ---- relational headliners on the driver's sf tables ----
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    t0 = time.monotonic()
    li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity"), F.sum("l_extendedprice"), F.avg("l_discount"), F.count("*")
    ).collect()
    timings["q_tpch1"] = time.monotonic() - t0

    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    c = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    t0 = time.monotonic()
    o.join(c, o.o_custkey == c.c_custkey).groupBy("c_mktsegment").agg(
        F.count("*"), F.sum("o_totalprice")
    ).collect()
    timings["q_join"] = time.monotonic() - t0

    from scalemine_spark.operators.similarity import cosine_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    t0 = time.monotonic()
    cosine_topk(emb, emb.filter(F.col("vec_id") < 8), k=5).collect()
    timings["q_cosine"] = time.monotonic() - t0

    total = sum(timings.values())
    out = {
        "metric": "pagerank_spmv_edges_per_sec",
        "value": round(pr_eps, 1),
        "unit": "edges/sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": sf,
        "total_sec": round(total, 3),
        "n_edges": n_edges,
        "n_pages": BENCH_PAGES,
        "cpus": CPUS,
        "cc_rounds": cc_info["rounds"],
        "cc_edges_per_sec": round(cc_eps, 1),
        "pr_iters": 10,
        "triangles": int(n_tri),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
