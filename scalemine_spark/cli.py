"""spark-submit entry point [BASELINE.json:14 "ships as spark-submit --py-files"].

Usage (cluster):
    make dist
    spark-submit --py-files dist/engine.zip cli_main.py <job> [options]
or locally:
    python -m scalemine_spark.cli <job> [options]

Jobs:
    extract    --pages <path> --out <path> [--langs en,de]
    pagerank   --edges <path> --out <path> [--iters N | --tol T] [--run-id R --ckpt DIR]
    cc         --edges <path> --out <path> [--run-id R --ckpt DIR]
    lpa        --edges <path> --out <path> [--iters N] [--run-id R --ckpt DIR]
    hits       --edges <path> --out <path> [--iters N] [--run-id R --ckpt DIR]
    bfs        --edges <path> --out <path> --sources 1,2,3 [--max-hops N] [--run-id R --ckpt DIR]
    ppr        --edges <path> --out <path> --sources 1,2,3 [--iters N | --tol T] [--run-id R --ckpt DIR]
    kcore      --edges <path> --out <path> --k N [--max-peels N] [--run-id R --ckpt DIR]
    sssp       --edges <path> --out <path> --sources 1,2,3 [--max-rounds N] [--weight-col W] [--run-id R --ckpt DIR]
    walks      --edges <path> --out <path> --sources 1,2,3 [--length N] [--walks-per-seed K]
    scc        --edges <path> --out <path> [--max-outer N --max-inner N] [--run-id R --ckpt DIR]
    triangles  --edges <path> --out <path> [--per-vertex]
    hostgraph  --edges <path> --out <path> [--keep-intra-host]  (url edges -> host graph)

Every algorithm job resumes automatically from the last committed checkpoint
iteration when --run-id/--ckpt point at an existing run.
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="scalemine-spark")
    sub = ap.add_subparsers(dest="job", required=True)

    pe = sub.add_parser("extract")
    pe.add_argument("--pages", required=True)
    pe.add_argument("--out", required=True)
    pe.add_argument("--langs", default=None)

    for name in ("pagerank", "cc", "lpa", "hits", "bfs", "ppr", "kcore", "sssp", "walks", "scc", "triangles", "hostgraph"):
        p = sub.add_parser(name)
        p.add_argument("--edges", required=True)
        p.add_argument("--out", required=True)
        if name == "pagerank":
            p.add_argument("--iters", type=int, default=None)
            p.add_argument("--tol", type=float, default=1e-8)
            p.add_argument("--damping", type=float, default=0.85)
            p.add_argument("--hub-threshold", type=int, default=None)
        if name == "lpa":
            p.add_argument("--iters", type=int, default=10)
        if name == "hits":
            p.add_argument("--iters", type=int, default=8)
        if name == "bfs":
            p.add_argument("--sources", required=True, help="comma-separated seed ids")
            p.add_argument("--max-hops", type=int, default=64)
        if name == "ppr":
            p.add_argument("--sources", required=True, help="comma-separated seed ids")
            p.add_argument("--iters", type=int, default=None)
            p.add_argument("--tol", type=float, default=1e-8)
            p.add_argument("--damping", type=float, default=0.85)
        if name == "kcore":
            p.add_argument("--k", type=int, required=True)
            p.add_argument("--max-peels", type=int, default=64)
        if name == "sssp":
            p.add_argument("--sources", required=True, help="comma-separated seed ids")
            p.add_argument("--max-rounds", type=int, default=64)
            p.add_argument("--weight-col", default="weight")
        if name == "walks":
            p.add_argument("--sources", required=True, help="comma-separated seed ids")
            p.add_argument("--length", type=int, default=10)
            p.add_argument("--walks-per-seed", type=int, default=1)
        if name == "scc":
            p.add_argument("--max-outer", type=int, default=16)
            p.add_argument("--max-inner", type=int, default=128)
        if name == "triangles":
            p.add_argument("--per-vertex", action="store_true")
        if name == "hostgraph":
            p.add_argument("--keep-intra-host", action="store_true")
        if name in ("pagerank", "cc", "lpa", "hits", "bfs", "ppr", "kcore", "sssp", "scc"):
            p.add_argument("--run-id", default=None)
            p.add_argument("--ckpt", default=None)

    for p in ap._subparsers._group_actions[0].choices.values():  # type: ignore[union-attr]
        p.add_argument("--cores", type=int, default=None)
        p.add_argument("--shuffle-partitions", type=int, default=None)
    return ap


def _ckpt(args, algo):
    from scalemine_spark.checkpoint import CheckpointManager

    if args.ckpt and args.run_id:
        return CheckpointManager(args.ckpt, args.run_id, algo)
    return None


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    from scalemine_spark.session import get_spark

    spark = get_spark(f"scalemine-{args.job}", cores=args.cores,
                      shuffle_partitions=args.shuffle_partitions)

    info: dict = {}
    if args.job == "extract":
        from scalemine_spark.extract import extract_edges
        from scalemine_spark.sources.pages import read_pages

        pages = read_pages(spark, args.pages)
        langs = args.langs.split(",") if args.langs else None
        edges = extract_edges(pages, langs)
        edges.write.mode("overwrite").parquet(args.out)
        info = {"job": "extract", "edges": spark.read.parquet(args.out).count()}
    else:
        edges = spark.read.parquet(args.edges)
        if args.job == "pagerank":
            from scalemine_spark.algorithms import pagerank

            ranks, info = pagerank(
                edges,
                d=args.damping,
                tol=args.tol,
                fixed_iters=args.iters,
                checkpointer=_ckpt(args, "pagerank"),
                hub_threshold=args.hub_threshold,
            )
            ranks.write.mode("overwrite").parquet(args.out)
            info.pop("deltas", None)
        elif args.job == "cc":
            from scalemine_spark.algorithms import connected_components

            comps, info = connected_components(edges, checkpointer=_ckpt(args, "cc"))
            comps.write.mode("overwrite").parquet(args.out)
        elif args.job == "lpa":
            from scalemine_spark.algorithms import label_propagation

            labels, info = label_propagation(
                edges, iters=args.iters, checkpointer=_ckpt(args, "lpa")
            )
            labels.write.mode("overwrite").parquet(args.out)
        elif args.job == "hits":
            from scalemine_spark.algorithms import hits

            scores, info = hits(
                edges, iters=args.iters, checkpointer=_ckpt(args, "hits")
            )
            scores.write.mode("overwrite").parquet(args.out)
        elif args.job == "bfs":
            from scalemine_spark.algorithms import bfs_hops

            dist, info = bfs_hops(
                edges,
                [int(s) for s in args.sources.split(",")],
                max_hops=args.max_hops,
                checkpointer=_ckpt(args, "bfs"),
            )
            dist.write.mode("overwrite").parquet(args.out)
            info.pop("frontier_sizes", None)
        elif args.job == "ppr":
            from scalemine_spark.algorithms import personalized_pagerank

            ranks, info = personalized_pagerank(
                edges,
                [int(s) for s in args.sources.split(",")],
                d=args.damping,
                tol=args.tol,
                fixed_iters=args.iters,
                checkpointer=_ckpt(args, "ppr"),
            )
            ranks.write.mode("overwrite").parquet(args.out)
            info.pop("deltas", None)
        elif args.job == "kcore":
            from scalemine_spark.algorithms import kcore

            core, info = kcore(
                edges,
                k=args.k,
                max_peels=args.max_peels,
                checkpointer=_ckpt(args, "kcore"),
            )
            core.write.mode("overwrite").parquet(args.out)
            info.pop("alive_sizes", None)
        elif args.job == "sssp":
            from scalemine_spark.algorithms import sssp

            dist, info = sssp(
                edges,
                [int(s) for s in args.sources.split(",")],
                max_rounds=args.max_rounds,
                weight_col=args.weight_col,
                checkpointer=_ckpt(args, "sssp"),
            )
            dist.write.mode("overwrite").parquet(args.out)
            info.pop("improved_sizes", None)
        elif args.job == "walks":
            from scalemine_spark.algorithms import random_walks

            corpus, info = random_walks(
                edges,
                [int(s) for s in args.sources.split(",")],
                length=args.length,
                walks_per_seed=args.walks_per_seed,
            )
            corpus.write.mode("overwrite").parquet(args.out)
            info.pop("frontier_sizes", None)
        elif args.job == "scc":
            from scalemine_spark.algorithms import scc

            labels, info = scc(
                edges,
                max_outer=args.max_outer,
                max_inner=args.max_inner,
                checkpointer=_ckpt(args, "scc"),
            )
            labels.write.mode("overwrite").parquet(args.out)
            info.pop("outer_sizes", None)
            info.pop("inner_iters", None)
        elif args.job == "triangles":
            from scalemine_spark.algorithms import triangle_count, triangles_per_vertex

            out = triangles_per_vertex(edges) if args.per_vertex else triangle_count(edges)
            out.write.mode("overwrite").parquet(args.out)
            info = {"job": "triangles"}
        elif args.job == "hostgraph":
            from scalemine_spark.graph import host_graph

            host_graph(edges, keep_intra_host=args.keep_intra_host).write.mode(
                "overwrite"
            ).parquet(args.out)
            info = {"job": "hostgraph"}

    print(json.dumps({"ok": True, **{k: v for k, v in info.items() if not isinstance(v, list)}}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
