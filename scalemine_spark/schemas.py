"""Explicit StructType schemas — never inferred in production paths (SURVEY §1.2).

The `pages` shape is mandated exactly by BASELINE.json:15 (input_hint):
(url:string, warc_ts:timestamp, html:binary, text:string, lang:string).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

PAGES = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), False),
        StructField("html", BinaryType(), False),
        StructField("text", StringType(), False),
        StructField("lang", StringType(), False),
    ]
)

DOC_TEXT = StructType(
    [
        StructField("url", StringType(), False),
        StructField("text", StringType(), False),
    ]
)

EDGES = StructType(
    [
        StructField("src", LongType(), False),
        StructField("dst", LongType(), False),
    ]
)

VERTICES = StructType(
    [
        StructField("id", LongType(), False),
        StructField("url", StringType(), True),
        StructField("out_deg", LongType(), False),
        StructField("in_deg", LongType(), False),
        StructField("deg_bucket", IntegerType(), False),
    ]
)

RANKS = StructType(
    [
        StructField("id", LongType(), False),
        StructField("rank", DoubleType(), False),
    ]
)

COMPONENTS = StructType(
    [
        StructField("id", LongType(), False),
        StructField("comp", LongType(), False),
    ]
)

LABELS = StructType(
    [
        StructField("id", LongType(), False),
        StructField("label", LongType(), False),
    ]
)

CSR_BLOCKS = StructType(
    [
        StructField("part_id", IntegerType(), False),
        StructField("vmin", LongType(), False),
        StructField("vmax", LongType(), False),
        StructField("indptr", ArrayType(LongType(), False), False),
        StructField("indices", ArrayType(LongType(), False), False),
        StructField("src_ids", ArrayType(LongType(), False), False),
    ]
)

CHECKPOINT_ROW = StructType(
    [
        StructField("run_id", StringType(), False),
        StructField("algo", StringType(), False),
        StructField("iter", IntegerType(), False),
        StructField("part_id", IntegerType(), False),
        StructField("metrics", MapType(StringType(), DoubleType()), True),
        StructField("state_path", StringType(), True),
        StructField("ts", TimestampType(), False),
    ]
)

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
