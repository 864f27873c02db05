"""T — Structured Streaming surface (SURVEY §2 T1-T6).

All jobs read the `events` parquet as a file-source stream (the driver's
stream replay table, TESTDATA.md) or the synthesized `pages` table (T1/S6),
run a streaming transformation, and drain synchronously into a memory sink
(processAllAvailable) so batch-style callers — tests and the driver's
queries() harness — get a plain DataFrame back. The transformations are
exactly what would run against a real unbounded source; only the sink/drain
is test-shaped.

Every batch aggregation here has a streaming-legal shape: complete-mode aggs
for unwindowed groupBys, watermarked windows for append mode, and
applyInPandasWithState for arbitrary state (T6).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_EVENTS_SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string, "
    "value double, props string"
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the file source needs a directory; glob-filter down to the events table
    return (
        spark.readStream.schema(_EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )


def run_stream_to_memory(stream_df: DataFrame, mode: str = "complete") -> DataFrame:
    """Drain a streaming DF into an in-memory table, return it as batch."""
    name = "m" + uuid.uuid4().hex[:12]
    q = (
        stream_df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return stream_df.sparkSession.table(name)


def stream_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1 — streaming ingest + running aggregation by event_type."""
    s = read_events_stream(spark, sf_dir)
    agg = s.groupBy("event_type").agg(F.count("*").alias("n"))
    return run_stream_to_memory(agg, "complete")


def tumbling_window_counts(spark: SparkSession, sf_dir: str, minutes: int = 10) -> DataFrame:
    """T3 — tumbling event-time windows (complete mode; watermarked append
    variant in T2 test). Returns (window_start STRING, n)."""
    s = read_events_stream(spark, sf_dir)
    agg = s.groupBy(F.window("ts", f"{minutes} minutes")).agg(F.count("*").alias("n"))
    out = run_stream_to_memory(agg, "complete")
    return out.select(
        F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "n",
    )


def watermarked_window_counts(spark: SparkSession, sf_dir: str, minutes: int = 10) -> DataFrame:
    """T2 — watermark + append mode: only windows sealed by the watermark are
    emitted (late data beyond 30 min is dropped). Exact emitted set depends
    on batch boundaries -> rows-only in the driver check; pytest pins the
    semantics with a controlled two-batch replay."""
    # watermarks require TIMESTAMP (tz-aware); session tz is pinned UTC
    s = (
        read_events_stream(spark, sf_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "30 minutes")
    )
    agg = s.groupBy(F.window("ts", f"{minutes} minutes")).agg(F.count("*").alias("n"))
    out = run_stream_to_memory(agg, "append")
    return out.select(
        F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"), "n"
    )


def session_windows_stream(spark: SparkSession, sf_dir: str, gap_minutes: int = 30) -> DataFrame:
    """T4 — per-user session windows (gap-based)."""
    s = read_events_stream(spark, sf_dir)
    agg = (
        s.groupBy(F.session_window("ts", f"{gap_minutes} minutes"), "user_id")
        .agg(F.count("*").alias("n_events"))
    )
    out = run_stream_to_memory(agg, "complete")
    return out.select(
        "user_id",
        F.date_format(F.col("session_window.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        "n_events",
    )


def stream_dedup_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5 — exactly-once-style dedup across micro-batches."""
    s = read_events_stream(spark, sf_dir).dropDuplicates(["event_id"])
    agg = s.groupBy(F.lit(1).alias("one")).agg(F.count("*").alias("n_unique"))
    return run_stream_to_memory(agg, "complete").select("n_unique")


def stateful_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6 — arbitrary stateful processing: per-user event counters kept in
    explicit state via applyInPandasWithState. Final counter per user equals
    the batch count (the oracle)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    s = read_events_stream(spark, sf_dir)

    def fn(key, pdfs, state: GroupState):
        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n]})

    out = s.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType="user_id long, n_events long",
        stateStructType="n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    drained = run_stream_to_memory(out, "update")
    # last update per user == final counter
    return drained.groupBy("user_id").agg(F.max("n_events").alias("n_events"))


def streaming_edge_extraction(
    spark: SparkSession,
    pages_path: str,
    work_dir: str,
    n_splits: int = 4,
) -> DataFrame:
    """T7 — the incremental half of T1's "streaming ingest + edge
    extraction" (round-5; the ingest half is t1/s6): pages arrive as
    micro-batches (the fixture is re-laid-out into ``n_splits`` files so
    the file source delivers multiple real triggers, not one), and each
    batch runs the SAME Stage-A fused mapInPandas extraction
    (extract.extract_edge_urls — the stream pass-through contract in
    sources/pages.py) inside ``foreachBatch``, appending its normalized
    edges to a parquet edge table. Upsert semantics are merge-on-read:
    append + dedup on (src_url, dst_url) at read time — the same protocol
    as the repo's parquet+manifest Iceberg stand-in (checkpoint.py).

    Returns the accumulated edge table as a batch DataFrame. Contract
    (the t7 oracle): the streamed union over all micro-batches equals the
    one-shot batch extraction of the same pages — edge-set symmetric
    difference zero.
    """
    import os

    from scalemine_spark.extract import extract_edge_urls
    from scalemine_spark.sources.pages import read_pages_stream

    src_dir = os.path.join(work_dir, "pages_split")
    out_dir = os.path.join(work_dir, "edges")
    ck_dir = os.path.join(work_dir, "ck")
    # multi-file layout -> maxFilesPerTrigger=1 gives n_splits micro-batches
    spark.read.parquet(pages_path).repartition(n_splits).write.mode(
        "overwrite"
    ).parquet(src_dir)

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        extract_edge_urls(batch_df).write.mode("append").parquet(out_dir)

    q = (
        read_pages_stream(spark, src_dir, max_files_per_trigger=1)
        .writeStream.foreachBatch(upsert)
        .option("checkpointLocation", ck_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir).dropDuplicates(["src_url", "dst_url"])


def streaming_incremental_components(
    spark: SparkSession,
    edges_path: str,
    work_dir: str,
    n_splits: int = 4,
) -> DataFrame:
    """T8 — incremental connected components over streaming edge batches
    (round 5): the "algorithm maintenance" half of the incremental loop
    whose extraction half is T7. Edge batches arrive as micro-batches;
    ``foreachBatch`` merges each batch into a persistent labels table by
    running :func:`connected_components` over (batch edges) UNION (previous
    labels re-encoded as pointer edges ``id -> comp``), then atomically
    versioning the labels parquet. Because the carried state is an
    already-converged star forest, each merge collapses in one or two
    distributed rounds and the driver-side union-find endgame absorbs the
    tail — per-batch cost is proportional to the BATCH plus the component
    structure it touches, not to history. This is how a link-graph engine
    keeps components fresh under a live crawl without recomputing 10^12
    accumulated edges per update.

    Correctness invariant (the t8 oracle): after the final batch, labels
    EQUAL the one-shot batch CC over the union of all batches — exactly,
    including min-id label choice and singleton vertices (labels rows
    ``comp == id`` re-enter as self-loops, which connected_components
    keeps as isolated vertices). A star forest is connectivity- and
    min-label-preserving, so the merge recursion is exact, batch order
    irrelevant.

    Returns the final labels (id, comp) as a batch DataFrame.
    """
    import os

    from scalemine_spark.algorithms import connected_components

    src_dir = os.path.join(work_dir, "edges_split")
    ck_dir = os.path.join(work_dir, "ck")
    # multi-file layout -> maxFilesPerTrigger=1 gives n_splits micro-batches
    spark.read.parquet(edges_path).repartition(n_splits).write.mode(
        "overwrite"
    ).parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema

    state: dict = {"labels_path": None}

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        e = batch_df.select("src", "dst")
        if state["labels_path"] is not None:
            prev = spark.read.parquet(state["labels_path"])
            e = e.unionByName(
                prev.select(F.col("id").alias("src"), F.col("comp").alias("dst"))
            )
        comps, _ = connected_components(e)
        out = os.path.join(work_dir, f"labels_v{batch_id}")
        comps.write.mode("overwrite").parquet(out)
        state["labels_path"] = out

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", ck_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert state["labels_path"] is not None, "stream delivered no batches"
    return spark.read.parquet(state["labels_path"])
