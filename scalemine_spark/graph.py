"""Stage B — graph materialization (SURVEY §2 rows S5, A2, A10, J3 support).

Salted, degree-bucketed edge table + per-partition CSR blocks
[BASELINE.json north_rule]. All pure DataFrame ops (JVM/codegen); the CSR
build is the one grouped-map (Arrow-batched) crossing.

Scale notes (100 TB): degrees are one shuffle each (map-side partial agg keeps
hot keys cheap); the salt column exists so downstream writers/joins can spread
a hot key across `n_salts` reducers deterministically; deg_bucket (log2) is
the planning signal for hub-broadcast joins (algorithms.pagerank) and the
skew smoke test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def out_degrees(edges: DataFrame) -> DataFrame:
    return edges.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("out_deg"))


def in_degrees(edges: DataFrame) -> DataFrame:
    return edges.groupBy(F.col("dst").alias("id")).agg(F.count("*").alias("in_deg"))


def vertex_ids(edges: DataFrame) -> DataFrame:
    return (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
    )


def deg_bucket(col) -> F.Column:
    """A10 — log2 degree bucket (0 for deg<=0)."""
    return F.when(col > 0, F.floor(F.log2(col.cast("double")))).otherwise(F.lit(0)).cast("int")


def build_vertices(edges: DataFrame, urls: DataFrame | None = None) -> DataFrame:
    """vertices(id, [url], out_deg, in_deg, deg_bucket). One shuffle per degree
    + one outer join; at 10^12 scale these are unavoidable linear passes."""
    v = (
        vertex_ids(edges)
        .join(out_degrees(edges), "id", "left")
        .join(in_degrees(edges), "id", "left")
        .select(
            "id",
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
        )
        .withColumn("deg_bucket", deg_bucket(F.col("out_deg") + F.col("in_deg")))
    )
    if urls is not None:
        v = v.join(urls, "id", "left").select("id", "url", "out_deg", "in_deg", "deg_bucket")
    return v


def with_salt(edges: DataFrame, n_salts: int = 16) -> DataFrame:
    """J3 support — deterministic salt (hash of the full edge): spreads any hot
    key across n_salts reducers; reproducible across runs/partitionings."""
    return edges.withColumn("salt", F.pmod(F.xxhash64("src", "dst"), F.lit(n_salts)).cast("int"))


def salted_bucketed_edges(edges: DataFrame, n_salts: int = 16) -> DataFrame:
    """The materialized edge-table shape (S5): src, dst, salt, src_bucket, dst_bucket."""
    deg_s = out_degrees(edges).withColumnRenamed("out_deg", "d_out")
    deg_d = in_degrees(edges).withColumnRenamed("in_deg", "d_in")
    return (
        with_salt(edges, n_salts)
        .join(deg_s, edges.src == deg_s.id, "left")
        .drop("id")
        .join(deg_d, edges.dst == deg_d.id, "left")
        .drop("id")
        .select(
            "src",
            "dst",
            "salt",
            deg_bucket(F.coalesce(F.col("d_out"), F.lit(0))).alias("src_bucket"),
            deg_bucket(F.coalesce(F.col("d_in"), F.lit(0))).alias("dst_bucket"),
        )
    )


def write_edge_table(edges: DataFrame, path: str, n_partitions: int = 32, n_salts: int = 16) -> None:
    """S5 sink — salted, degree-bucketed edges partitioned for reuse."""
    (
        salted_bucketed_edges(edges, n_salts)
        .repartition(n_partitions, "salt", "src_bucket")
        .write.mode("overwrite")
        .parquet(path)
    )


def symmetrize(edges: DataFrame) -> DataFrame:
    """Undirected view: both directions, deduped, no self-loops."""
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    return e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).distinct()


def canonical_undirected(edges: DataFrame) -> DataFrame:
    """Each undirected edge once as (a, b) with a < b."""
    return (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
    )


def host_graph(
    url_edges: DataFrame,
    src_col: str = "src_url",
    dst_col: str = "dst_url",
    keep_intra_host: bool = False,
) -> DataFrame:
    """X6 — contract the URL-level link graph to the host graph:
    (src_host, dst_host, weight = number of URL-level links).

    The standard web-graph reduction (Common-Crawl host-level graph): at
    10^12 URL edges the host graph is ~10^4x smaller and is what PageRank/
    HITS run on for domain-level analysis. Plan at scale: host extraction
    is a narrow JVM-side expression (try_parse_url, no Python — crawl data
    always contains malformed URLs, and ANSI parse_url throws), the rollup is
    ONE two-level hash agg — map-side partial collapses each executor's
    repeated host pairs (heavy repetition: a site links the same hosts
    over and over) before the single exchange on (src_host, dst_host).
    Intra-host (navigation) links are dropped by default.
    """
    h = lambda c: F.try_parse_url(F.col(c), F.lit("HOST"))  # noqa: E731
    e = url_edges.select(h(src_col).alias("src_host"), h(dst_col).alias("dst_host"))
    e = e.filter(F.col("src_host").isNotNull() & F.col("dst_host").isNotNull())
    if not keep_intra_host:
        e = e.filter(F.col("src_host") != F.col("dst_host"))
    return e.groupBy("src_host", "dst_host").agg(F.count("*").alias("weight"))


def degree_histogram(edges: DataFrame) -> DataFrame:
    """A10 — degree-distribution histogram over total degree."""
    deg = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    return (
        deg.withColumn("bucket", deg_bucket(F.col("deg")))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_vertices"), F.sum("deg").alias("sum_deg"))
        .orderBy("bucket")
    )


def build_csr_blocks(edges: DataFrame, num_blocks: int = 32) -> DataFrame:
    """U2 — per-partition CSR blocks [BASELINE.json:6].

    Edges are hash-partitioned by pmod(src, num_blocks); each block packs its
    adjacency into (src_ids, indptr, indices) numpy arrays via a single
    Arrow-batched grouped-map. Consumers (SpMV kernels) mapInArrow over the
    blocks, multiplying a broadcast/joined rank slice — the vectorized inner
    kernel of the measured SpMV throughput metric.
    """
    import numpy as np
    import pandas as pd

    schema = (
        "part_id int, vmin long, vmax long, src_ids array<long>, "
        "indptr array<long>, indices array<long>"
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["src", "dst"], kind="mergesort")
        src = pdf["src"].to_numpy()
        dst = pdf["dst"].to_numpy()
        uniq, counts = np.unique(src, return_counts=True)
        indptr = np.concatenate([[0], np.cumsum(counts)])
        return pd.DataFrame(
            {
                "part_id": [int(pdf["part_id"].iloc[0])],
                "vmin": [int(uniq.min()) if len(uniq) else 0],
                "vmax": [int(uniq.max()) if len(uniq) else 0],
                "src_ids": [uniq.tolist()],
                "indptr": [indptr.tolist()],
                "indices": [dst.tolist()],
            }
        )

    parts = edges.withColumn("part_id", F.pmod(F.col("src"), F.lit(num_blocks)).cast("int"))
    return parts.groupBy("part_id").applyInPandas(pack, schema)
