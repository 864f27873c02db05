"""Library API facade (SURVEY §3.3): the one-object entry point.

    from scalemine_spark.linkgraph import LinkGraph

    lg = LinkGraph.from_pages(pages_df)            # Stage A (lazy)
    ranks, info = lg.pagerank(d=0.85, tol=1e-8)    # G1
    comps, _ = lg.connected_components()           # G2
    labels, _ = lg.label_propagation(iters=5)      # G3
    tri = lg.triangle_count()                      # G4
    lg.write_edge_table("/path/edges")             # S5

Everything stays a lazy DataFrame until an action inside the iteration
loops; checkpointing/resume is wired by passing run_id + checkpoint_root.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from scalemine_spark.checkpoint import CheckpointManager


class LinkGraph:
    def __init__(self, edges: DataFrame, checkpoint_root: str | None = None, run_id: str = "run"):
        self.edges = edges
        self.checkpoint_root = checkpoint_root
        self.run_id = run_id

    # -- constructors --------------------------------------------------------
    @classmethod
    def from_pages(
        cls,
        pages: DataFrame,
        langs: list[str] | None = None,
        checkpoint_root: str | None = None,
        run_id: str = "run",
    ) -> "LinkGraph":
        from scalemine_spark.extract import extract_edges

        return cls(extract_edges(pages, langs), checkpoint_root, run_id)

    @classmethod
    def from_edges(cls, edges: DataFrame, **kw) -> "LinkGraph":
        return cls(edges.select("src", "dst"), **kw)

    @classmethod
    def from_lg_file(cls, spark, path: str, **kw) -> "LinkGraph":
        from scalemine_spark.sources.lg import read_lg

        _, edges = read_lg(spark, path)
        return cls(edges.select("src", "dst"), **kw)

    # -- internals -----------------------------------------------------------
    def _ckpt(self, algo: str) -> CheckpointManager | None:
        if self.checkpoint_root is None:
            return None
        return CheckpointManager(self.checkpoint_root, self.run_id, algo)

    # -- Stage B -------------------------------------------------------------
    def vertices(self) -> DataFrame:
        from scalemine_spark.graph import build_vertices

        return build_vertices(self.edges)

    def degree_histogram(self) -> DataFrame:
        from scalemine_spark.graph import degree_histogram

        return degree_histogram(self.edges)

    def write_edge_table(self, path: str, n_partitions: int = 32, n_salts: int = 16) -> None:
        from scalemine_spark.graph import write_edge_table

        write_edge_table(self.edges, path, n_partitions, n_salts)

    def csr_blocks(self, num_blocks: int = 32) -> DataFrame:
        from scalemine_spark.graph import build_csr_blocks

        return build_csr_blocks(self.edges, num_blocks)

    # -- Stage C -------------------------------------------------------------
    def pagerank(self, **kw) -> tuple[DataFrame, dict]:
        from scalemine_spark.algorithms import pagerank

        kw.setdefault("checkpointer", self._ckpt("pagerank"))
        return pagerank(self.edges, **kw)

    def connected_components(self, **kw) -> tuple[DataFrame, dict]:
        from scalemine_spark.algorithms import connected_components

        kw.setdefault("checkpointer", self._ckpt("cc"))
        return connected_components(self.edges, **kw)

    def label_propagation(self, **kw) -> tuple[DataFrame, dict]:
        from scalemine_spark.algorithms import label_propagation

        kw.setdefault("checkpointer", self._ckpt("lpa"))
        return label_propagation(self.edges, **kw)

    def triangle_count(self) -> DataFrame:
        from scalemine_spark.algorithms import triangle_count

        return triangle_count(self.edges)

    def triangles_per_vertex(self) -> DataFrame:
        from scalemine_spark.algorithms import triangles_per_vertex

        return triangles_per_vertex(self.edges)
