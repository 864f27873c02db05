"""Round-4 regression tests: IVF ANN (default + pluggable codebook),
PageRank hub tie-inflation guard + committed-state slimming, CC tail-round
shuffle-width coalescing (conf restore), extraction streaming pass-through."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import edges_df, pagerank_numpy


# ---------------------------------------------------------------------------
# d11 — IVF ANN
# ---------------------------------------------------------------------------


def _clustered_emb(spark, n=600, n_clusters=12, dim=16, std=0.15, seed=7):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = np.arange(n) % n_clusters
    pts = centers[assign] + std * rng.standard_normal((n, dim))
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": np.arange(n), "embedding": [r.astype("float32").tolist() for r in pts]}
        )
    )
    return df, centers


def test_ann_ivf_recall_on_clustered_data(spark):
    """With a codebook equal to the true cluster centers and n_probe
    covering the neighborhood, IVF recovers (nearly) the exact top-k —
    near neighbors share the assigned list."""
    from scalemine_spark.operators.similarity import ann_ivf, cosine_topk

    emb, centers = _clustered_emb(spark)
    qs = emb.filter(F.col("vec_id") < 8)
    exact = {(r["qid"], r["vec_id"]) for r in cosine_topk(emb, qs, k=5).collect()}
    approx = {
        (r["qid"], r["vec_id"])
        for r in ann_ivf(emb, qs, k=5, n_probe=3, centroids=centers).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, recall


def test_ann_ivf_default_codebook_deterministic_and_shuffle_stable(spark):
    """The first-K codebook path (the oracle-replayed configuration) returns
    identical rows regardless of input partitioning — rounded-similarity
    argmax with id tie-breaks leaves no room for partition order."""
    from scalemine_spark.operators.similarity import ann_ivf

    emb, _ = _clustered_emb(spark, n=300)
    qs = emb.filter(F.col("vec_id") < 5)
    a = sorted(map(tuple, ann_ivf(emb, qs, k=3).collect()))
    b = sorted(map(tuple, ann_ivf(emb.repartition(13), qs.repartition(3), k=3).collect()))
    assert a == b and len(a) == 15


def test_ann_ivf_assignment_is_partial_aggregate(spark):
    """Index-build scale shape: the K-way centroid fan-out must collapse in
    a partial('max') HashAggregate BEFORE the exchange — an argmax via
    window/row_number would instead shuffle+sort corpus x K rows."""
    from scalemine_spark.operators.similarity import ann_ivf

    emb, _ = _clustered_emb(spark, n=100)
    qs = emb.filter(F.col("vec_id") < 2)
    plan = ann_ivf(emb, qs, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "partial_max" in plan or "partial_first" in plan, plan


# ---------------------------------------------------------------------------
# g1 — hub tie-inflation guard + state slimming
# ---------------------------------------------------------------------------


def test_pagerank_tie_inflated_hub_set_falls_back(spark):
    """Auto path on a near-uniform graph: degree ties qualify EVERY vertex
    at the K-th cutoff, so the guard (n_hubs > 2 * target, target floor 16)
    abandons the split rather than broadcast the whole vertex set — and
    ranks still match numpy. hub_floor=1 stands in for the production 1024
    floor so a 40-vertex fixture can reach the top-K path."""
    from scalemine_spark.algorithms import pagerank

    pairs = [(i, (i + 1) % 40) for i in range(40)] + [(i, (i + 2) % 40) for i in range(40)]
    e = edges_df(spark, pairs)
    ranks, info = pagerank(e, fixed_iters=8, hub_threshold="auto", hub_floor=1)
    assert info["hub_threshold"] is None  # guard tripped: 40 tied hubs > 32
    exp = pagerank_numpy(pairs, iters=8)
    got = {r["id"]: r["rank"] for r in ranks.collect()}
    assert all(abs(got[v] - exp[v]) < 1e-9 for v in exp)


def test_pagerank_pinned_threshold_honored_on_small_graphs(spark):
    """A user-PINNED hub threshold matching a few dozen hubs is far inside
    the absolute broadcast budget and must NOT be silently disabled (the
    auto-path 2x-target guard does not apply to explicit requests)."""
    from scalemine_spark.algorithms import pagerank

    pairs = [(i, (i + 1) % 40) for i in range(40)] + [(i, (i + 2) % 40) for i in range(40)]
    e = edges_df(spark, pairs)
    ranks, info = pagerank(e, fixed_iters=8, hub_threshold=1)
    assert info["hub_threshold"] == 1 and info["n_hubs"] == 40
    exp = pagerank_numpy(pairs, iters=8)
    got = {r["id"]: r["rank"] for r in ranks.collect()}
    assert all(abs(got[v] - exp[v]) < 1e-9 for v in exp)


def test_pagerank_committed_state_is_slim(spark, tmp_path):
    """with_prev=False commits (id, out_deg, rank) only; with_prev=True
    keeps the previous vector for the U6 consumer."""
    from scalemine_spark.algorithms import pagerank
    from scalemine_spark.checkpoint import CheckpointManager

    pairs = [(i, (i + 1) % 20) for i in range(20)]
    e = edges_df(spark, pairs)
    for with_prev, cols in [(False, {"id", "out_deg", "rank"}),
                            (True, {"id", "out_deg", "rank", "pr"})]:
        ck = CheckpointManager(str(tmp_path), f"wp{with_prev}", "pagerank")
        pagerank(e, fixed_iters=3, checkpointer=ck, with_prev=with_prev)
        state = ck.read_state(spark, ck.latest())
        assert set(state.columns) == cols, state.columns


# ---------------------------------------------------------------------------
# g2 — tail-round coalescing
# ---------------------------------------------------------------------------


def test_cc_restores_shuffle_partitions_conf(spark):
    """The loop mutates spark.sql.shuffle.partitions per round and MUST
    restore it afterwards (and still be exact)."""
    from scalemine_spark.algorithms import connected_components

    before = spark.conf.get("spark.sql.shuffle.partitions")
    pairs = [(i, i + 1) for i in range(0, 200, 2)] + [(i, i + 100) for i in range(50)]
    comps, info = connected_components(edges_df(spark, pairs))
    n = comps.count()
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
    assert info["rounds"] >= 2 and n > 0


# ---------------------------------------------------------------------------
# x* — streaming pass-through
# ---------------------------------------------------------------------------


def test_ensure_parallelism_passes_streams_through(spark):
    from scalemine_spark.extract import _ensure_parallelism

    stream = spark.readStream.format("rate").load()
    out = _ensure_parallelism(stream)
    assert out is stream  # unchanged — df.rdd would raise on a stream
