"""Round-2 regression tests: asof per-row contract, labelprop self-loop
vertices, Hadoop-FS checkpointing, multi-probe ANN recall, d2 skew cap,
fused extraction parity, vectorized frame sampling, md5-parity dedup."""

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR, edges_df


# -- J9 as-of join -----------------------------------------------------------


def test_asof_duplicate_left_rows_each_survive(spark):
    """Fully duplicate left rows must each yield one output row (per-left-ROW
    contract, not per-left-VALUE)."""
    from scalemine_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, 10), (1, 10), (2, 5)], "k long, ts long"
    )
    right = spark.createDataFrame(
        [(1, 8, "a"), (1, 9, "b"), (2, 9, "c")], "k long, ts long, v string"
    )
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="ts").collect()
    assert len(out) == 3
    dup_rows = [r for r in out if r.k == 1]
    assert len(dup_rows) == 2 and all(r.r_v == "b" for r in dup_rows)
    # k=2: right ts=9 > left ts=5 -> no match -> nulls
    (miss,) = [r for r in out if r.k == 2]
    assert miss.r_v is None and miss.r_ts is None


def test_asof_forward_and_ties(spark):
    from scalemine_spark.operators.joins import asof_join

    left = spark.createDataFrame([(1, 5)], "k long, ts long")
    right = spark.createDataFrame(
        [(1, 7, "x"), (1, 7, "y"), (1, 6, "z")], "k long, ts long, v string"
    )
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="ts", direction="forward").collect()
    assert len(out) == 1 and out[0].r_ts == 6 and out[0].r_v == "z"


def test_asof_matches_window_formulation(spark):
    """Parity vs the naive window formulation on the events table."""
    from pyspark.sql.window import Window

    from scalemine_spark.operators.joins import asof_join

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    snaps = ev.select("user_id", F.col("ts").alias("sts"), F.col("value").alias("sval"))
    probes = ev.groupBy("user_id").agg(F.max("ts").alias("ts")).limit(50)
    # per-key as-of at each user's max ts
    r = snaps.withColumnRenamed("sts", "rts")
    got = asof_join(
        probes,
        r.select(F.col("user_id"), F.col("rts"), F.col("sval")),
        on="user_id",
        left_ts="ts",
        right_ts="rts",
    )
    w = Window.partitionBy("user_id").orderBy(F.col("rts").desc(), F.col("sval").desc())
    exp = (
        probes.join(r, "user_id")
        .filter(F.col("rts") <= F.col("ts"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "ts", F.col("rts").alias("r_rts"), F.col("sval").alias("r_sval"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect()))


# -- G3 label propagation: self-loop-only vertices ---------------------------


def test_lpa_self_loop_vertex_keeps_label(spark):
    from scalemine_spark.algorithms import label_propagation

    e = edges_df(spark, [(1, 2), (2, 3), (9, 9)])  # 9 exists only as self-loop
    labels, _ = label_propagation(e, iters=2)
    got = {r.id: r.label for r in labels.collect()}
    assert 9 in got and got[9] == 9
    assert set(got) == {1, 2, 3, 9}


# -- S3 checkpointing through the Hadoop FS layer ----------------------------


def test_checkpoint_hadoop_fs_roundtrip(spark, tmp_path):
    """file:// root forces the HadoopFS backend end-to-end (listdir, footer
    range-read, atomic manifest rename, resume)."""
    from scalemine_spark.algorithms import pagerank
    from scalemine_spark.checkpoint import CheckpointManager
    from scalemine_spark.fsio import HadoopFS

    root = f"file://{tmp_path}/ck"
    ck = CheckpointManager(root, "run1", "pagerank")
    assert isinstance(ck._fs, HadoopFS)

    e = edges_df(spark, [(1, 2), (2, 3), (3, 1), (4, 1)])
    ranks1, info1 = pagerank(e, fixed_iters=3, checkpointer=ck)
    r1 = {r.id: r.rank for r in ranks1.collect()}
    assert ck.latest() == 2
    m = ck.read_manifest(2)
    assert m["row_count"] == 4 and len(m["files"]) >= 1
    assert "l1_delta" in m["metrics"]

    # resume: a fresh manager over the same root fast-forwards past iter 2
    ck2 = CheckpointManager(root, "run1", "pagerank")
    ranks2, info2 = pagerank(e, fixed_iters=5, checkpointer=ck2)
    assert info2["iters_run"] == 2  # only iters 3,4 execute
    assert ck2.latest() == 4

    # POSIX manager over the same (local) files agrees
    ck3 = CheckpointManager(str(tmp_path / "ck"), "run1", "pagerank")
    assert ck3.latest() == 4
    hist = ck3.metrics_history()
    assert [h["iter"] for h in hist] == [0, 1, 2, 3, 4]


def test_fsio_hadoop_parquet_footer(spark, tmp_path):
    import pyarrow.parquet as pq

    from scalemine_spark.fsio import HadoopFS

    p = str(tmp_path / "t.parquet")
    spark.range(123).write.parquet(p)
    fs = HadoopFS(f"file://{p}")
    names = [n for n in fs.listdir(f"file://{p}") if n.endswith(".parquet")]
    total = sum(fs.parquet_num_rows(f"file://{p}/{n}") for n in names)
    assert total == 123
    # parity with local pyarrow
    local = sum(pq.read_metadata(os.path.join(p, n)).num_rows for n in names)
    assert local == 123


# -- d6 multi-probe ANN recall ------------------------------------------------


def test_ann_multiprobe_recall(spark):
    from scalemine_spark.operators.similarity import ann_lsh, cosine_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qs = emb.filter(F.col("vec_id") < 5)
    exact = set(map(tuple, cosine_topk(emb, qs, k=3).select("qid", "vec_id").collect()))
    ann = set(
        map(
            tuple,
            ann_lsh(emb, qs, k=3, n_bits=8, n_tables=6, probe_radius=3)
            .select("qid", "vec_id")
            .collect(),
        )
    )
    assert len(ann & exact) / len(exact) >= 0.9


# -- d2 skew cap ---------------------------------------------------------------


def test_d2_df_cap_bounds_join_buckets(spark):
    """A stopword present in EVERY doc must not create a join bucket: with
    the df cap the candidate self-join sees bounded bucket sizes."""
    import pandas as pd

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": range(200),
                "lang": ["en"] * 200,
                # every doc shares 'the'; only consecutive ids share 'tok<i>'
                "text": [f"the tok{i} tok{i+1}" for i in range(200)],
            }
        )
    )
    cap = 64
    allwords = docs.select(
        "doc_id", "lang", F.explode(F.array_distinct(F.split("text", " "))).alias("w")
    )
    dfreq = allwords.groupBy("w").agg(F.count("*").alias("df"))
    capped = allwords.join(dfreq.filter(F.col("df") <= cap).select("w"), "w")
    sizes = capped.groupBy("w").agg(F.count("*").alias("n")).agg(F.max("n")).collect()[0][0]
    assert sizes <= cap  # no bucket bigger than the cap -> no quadratic blowup
    # 'the' must be gone
    assert capped.filter(F.col("w") == "the").count() == 0


# -- fused extraction parity ---------------------------------------------------


def test_fused_extract_docs_matches_separate_udfs(spark, pages_small):
    from scalemine_spark.extract import extract_docs, extract_doc_text

    pages, _ = pages_small
    sample = pages.limit(300)
    fused = extract_docs(sample).select("url", "text")
    sep = extract_doc_text(sample)
    assert fused.exceptAll(sep).count() == 0 and sep.exceptAll(fused).count() == 0


def test_fused_edges_match_ground_truth(spark, pages_small):
    from scalemine_spark.extract import extract_edge_urls

    pages, expected = pages_small
    got = extract_edge_urls(pages)
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0


# -- m3 vectorized frame sampling ---------------------------------------------


def test_frame_sample_vectorized_parity(spark):
    import pandas as pd

    from scalemine_spark.functions.multimodal import frame_sample

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3], "text": ["a" * 1000, "b" * 255, "c" * 1537]})
    ).select("doc_id", F.encode("text", "utf-8").alias("payload"))
    rows = sorted(map(tuple, frame_sample(docs, block_bytes=256, every_k=2).collect()))
    # doc1: 1000//256=3 frames -> idx 0,2 ; doc2: 0 frames ; doc3: 6 frames -> 0,2,4
    assert rows == [
        (1, 0, 256), (1, 2, 256 if 1000 - 2 * 256 >= 256 else 1000 - 2 * 256),
        (3, 0, 256), (3, 2, 256), (3, 4, 256),
    ]


# -- md5-parity dedup variants --------------------------------------------------


def test_simhash_md5_deterministic_and_distinct(spark):
    import pandas as pd

    from scalemine_spark.operators.dedup import simhash

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3], "text": ["a b c", "a b c", "x y z"]})
    )
    got = {r.id: r.simhash for r in simhash(docs, n_bits=60, hasher="md5", sep=" ").collect()}
    assert got[1] == got[2] != got[3]
    assert all(0 <= v < 2**60 for v in got.values())


def test_minhash_near_dups_finds_exact_dup(spark):
    import pandas as pd

    from scalemine_spark.operators.dedup import minhash_near_dups

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": ["alpha beta gamma delta", "alpha beta gamma delta", "unrelated words here now"],
            }
        )
    )
    pairs = minhash_near_dups(docs, threshold=0.8, num_hashes=16, bands=8, n=1, hasher="md5", sep=" ").collect()
    assert [(r.id1, r.id2, r.jaccard) for r in pairs] == [(1, 2, 1.0)]
