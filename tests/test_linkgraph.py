"""LinkGraph facade (SURVEY §3.3 library entry point)."""

from scalemine_spark.linkgraph import LinkGraph
from tests.conftest import components_oracle, edges_df, pagerank_numpy


def test_from_pages_end_to_end(spark, pages_small):
    pages, expected = pages_small
    lg = LinkGraph.from_pages(pages)
    assert lg.edges.count() == expected.count()
    v = lg.vertices()
    assert {"id", "out_deg", "in_deg", "deg_bucket"} <= set(v.columns)


def test_facade_algorithms(spark):
    pairs = [(0, 1), (1, 2), (2, 0), (3, 4)]
    lg = LinkGraph.from_edges(edges_df(spark, pairs))
    ranks, _ = lg.pagerank(fixed_iters=8)
    exp = pagerank_numpy(pairs, iters=8)
    got = {r["id"]: r["rank"] for r in ranks.collect()}
    assert all(abs(got[k] - exp[k]) < 1e-9 for k in exp)

    comps, _ = lg.connected_components()
    assert {r["id"]: r["comp"] for r in comps.collect()} == components_oracle(pairs)

    assert lg.triangle_count().collect()[0]["triangles"] == 1


def test_facade_checkpointing(spark, tmp_path):
    pairs = [(0, 1), (1, 2), (2, 0)]
    lg = LinkGraph.from_edges(
        edges_df(spark, pairs), checkpoint_root=str(tmp_path), run_id="fr"
    )
    lg.pagerank(fixed_iters=3)
    from scalemine_spark.checkpoint import CheckpointManager

    assert CheckpointManager(str(tmp_path), "fr", "pagerank").latest() == 2


def test_facade_lg_roundtrip(spark, tmp_path):
    from scalemine_spark.sources.lg import write_lg

    pairs = [(0, 1), (1, 2)]
    path = str(tmp_path / "g.lg")
    write_lg(edges_df(spark, pairs), path)
    lg = LinkGraph.from_lg_file(spark, path)
    assert sorted(tuple(r) for r in lg.edges.collect()) == pairs
