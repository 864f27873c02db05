"""S2/S6 — the `pages` source with schema enforcement [BASELINE.json:15].

Batch: explicit-schema parquet read (column pruning means `html BINARY` is
only fetched when an extraction column is requested — verify with
.explain(): ReadSchema must not contain html for text-only queries).

Streaming: the same schema as an unbounded micro-batch stream; Stage-A
pandas UDFs (extract.py) apply to the stream unchanged.

At 10^12-document scale this table would be Iceberg-partitioned by crawl
date (`dt = date(warc_ts)`); partition pruning on dt is then free. No
Iceberg jar exists in this sandbox (SURVEY §0), so the parquet layout
stands in; the reader API is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from scalemine_spark.schemas import PAGES


def read_pages(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(PAGES).parquet(path)


def read_pages_stream(spark: SparkSession, path: str, max_files_per_trigger: int = 1) -> DataFrame:
    """`path` may be a directory or a single parquet file (the file source
    requires a directory, so a file path becomes dir + pathGlobFilter)."""
    import os

    reader = spark.readStream.schema(PAGES).option("maxFilesPerTrigger", max_files_per_trigger)
    if os.path.isfile(path):
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    return reader.parquet(path)
