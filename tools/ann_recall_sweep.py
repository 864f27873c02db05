"""d6 ANN recall curve (VERDICT r2 #7, r3 #8): recall@k vs candidate count
over (n_tables, probe_radius), against the exact cosine_topk ground truth.

Two fixtures:
  --fixture sf         the driver's sf embeddings table (i.i.d. vectors — the
                       DOCUMENTED WORST CASE for hyperplane LSH: no cluster
                       structure means hash agreement carries minimal signal)
  --fixture clustered  seeded mixture-of-Gaussians (64 unit-norm centers,
                       per-point Gaussian noise) — realistic embedding
                       geometry, where near neighbors share most hyperplane
                       signs and recall at a given candidate budget is higher.

Curves are stored side by side under their fixture key in
BENCH/ann_recall.json, so the ship config's recall/candidate trade is
evidenced on both geometries.

Usage: python tools/ann_recall_sweep.py [--sf /root/testdata/sf0.1]
           [--fixture sf|clustered] [--k 10] [--n-queries 20]
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--n-queries", type=int, default=20)
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--fixture", choices=("sf", "clustered"), default="sf")
    ap.add_argument("--algo", choices=("lsh", "ivf"), default="lsh")
    ap.add_argument("--n-centroids", type=int, default=64)
    ap.add_argument(
        "--codebook", choices=("firstk", "kmeans", "kmeans-op"), default="firstk",
        help="IVF codebook: 'firstk' = the deterministic oracle default "
             "(arbitrary vectors — a deliberately weak quantizer), 'kmeans' "
             "= 15 seeded driver-side numpy Lloyd iterations on a 20k sample "
             "(kept so round-4 curves stay reproducible), 'kmeans-op' = the "
             "first-class distributed operator "
             "(operators.similarity.kmeans_codebook, round 5 — the "
             "production path: partial-agg Lloyd on a seeded sample)",
    )
    ap.add_argument("--n-vectors", type=int, default=50_000, help="clustered fixture size")
    ap.add_argument("--n-clusters", type=int, default=64)
    ap.add_argument("--cluster-std", type=float, default=0.25)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from scalemine_spark.operators.similarity import ann_lsh, cosine_topk
    from scalemine_spark.session import get_spark

    spark = get_spark("annsweep", cores=args.cores, shuffle_partitions=2 * args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    if args.fixture == "clustered":
        import numpy as np
        import pandas as pd

        rng = np.random.default_rng(args.seed)
        sf_dim = len(
            spark.read.parquet(f"{args.sf}/embeddings.parquet")
            .select("embedding").first()[0]
        )
        centers = rng.standard_normal((args.n_clusters, sf_dim))
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        assign = np.arange(args.n_vectors) % args.n_clusters
        pts = centers[assign] + args.cluster_std * rng.standard_normal(
            (args.n_vectors, sf_dim)
        )
        emb = spark.createDataFrame(
            pd.DataFrame(
                {"vec_id": np.arange(args.n_vectors),
                 "embedding": [row.astype("float32").tolist() for row in pts]}
            )
        ).repartition(2 * args.cores).persist()
    else:
        emb = spark.read.parquet(f"{args.sf}/embeddings.parquet").persist()
    n_corpus = emb.count()
    dim = len(emb.select("embedding").first()[0])
    if args.algo == "ivf":
        # the default IVF codebook is the FIRST n_centroids vectors — taking
        # queries from the same prefix would make every query a codebook
        # member (its own list is always probed with self-similarity 1.0),
        # biasing recall upward. Measure with disjoint queries instead.
        queries = (
            emb.filter(F.col("vec_id") >= args.n_centroids)
            .orderBy("vec_id").limit(args.n_queries).persist()
        )
    else:
        queries = emb.orderBy("vec_id").limit(args.n_queries).persist()

    truth_rows = cosine_topk(emb, queries, k=args.k).collect()
    truth: dict = {}
    for r in truth_rows:
        truth.setdefault(r["qid"], set()).add(r["vec_id"])
    n_truth = sum(len(v) for v in truth.values())

    results = []
    if args.algo == "ivf":
        from scalemine_spark.operators.similarity import ann_ivf

        centroids = None
        if args.codebook == "kmeans-op":
            from scalemine_spark.operators.similarity import kmeans_codebook

            frac = min(1.0, 20_000 / n_corpus)
            centroids = kmeans_codebook(
                emb, k=args.n_centroids, iters=15, dim=dim,
                sample_frac=None if frac >= 1.0 else frac, seed=args.seed,
            )
        elif args.codebook == "kmeans":
            import numpy as np

            sample = np.array(
                [r["embedding"] for r in emb.orderBy("vec_id").limit(20_000).collect()],
                dtype="float64",
            )
            rng = np.random.default_rng(args.seed)
            centroids = sample[rng.choice(len(sample), args.n_centroids, replace=False)]
            for _ in range(15):  # Lloyd iterations, cosine assignment
                sn = sample / np.linalg.norm(sample, axis=1, keepdims=True)
                cn = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
                assign = (sn @ cn.T).argmax(axis=1)
                for c in range(args.n_centroids):
                    m = assign == c
                    if m.any():
                        centroids[c] = sample[m].mean(axis=0)

        for n_probe in (1, 2, 4, 8):
            t0 = time.monotonic()
            approx = ann_ivf(
                emb, queries, k=args.k, n_centroids=args.n_centroids,
                n_probe=n_probe, centroids=centroids,
            )
            got: dict = {}
            for r in approx.collect():
                got.setdefault(r["qid"], set()).add(r["vec_id"])
            hit = sum(len(truth[q] & got.get(q, set())) for q in truth)
            results.append(
                {
                    "n_centroids": args.n_centroids,
                    "n_probe": n_probe,
                    "recall": round(hit / n_truth, 4),
                    # each query scans n_probe of n_centroids inverted lists
                    "candidate_frac_of_bruteforce": round(n_probe / args.n_centroids, 4),
                    "seconds": round(time.monotonic() - t0, 1),
                }
            )
            print(f"  ivf K={args.n_centroids} probe={n_probe}: recall={results[-1]['recall']}",
                  file=sys.stderr)
    grid = [] if args.algo == "ivf" else (
        list(itertools.product((1, 2, 4), (0, 1, 2))) + [(6, 3)]  # (6,3) = d6 ship config
    )
    for n_tables, radius in grid:
        t0 = time.monotonic()
        approx = ann_lsh(
            emb, queries, k=args.k, n_bits=8, dim=dim,
            n_tables=n_tables, probe_radius=radius,
        )
        # candidate count BEFORE top-k: re-run the candidate stage alone by
        # taking all ranked rows (ann_lsh already dedups candidates); the
        # post-top-k row count underestimates work, so count bucket pairs.
        got: dict = {}
        for r in approx.collect():
            got.setdefault(r["qid"], set()).add(r["vec_id"])
        hit = sum(len(truth[q] & got.get(q, set())) for q in truth)
        # candidate volume: expected bucket-pair count per table/probe
        n_probe_buckets = sum(
            1 for m in range(2**8) if bin(m).count("1") <= radius
        )
        est_candidates = n_tables * n_probe_buckets * args.n_queries * (n_corpus / 2**8)
        dt = time.monotonic() - t0
        results.append(
            {
                "n_tables": n_tables,
                "probe_radius": radius,
                "recall": round(hit / n_truth, 4),
                "est_candidates": int(est_candidates),
                "candidate_frac_of_bruteforce": round(
                    est_candidates / (args.n_queries * n_corpus), 4
                ),
                "seconds": round(dt, 1),
            }
        )
        print(f"  tables={n_tables} radius={radius}: recall={results[-1]['recall']}", file=sys.stderr)

    curve = {
        "k": args.k, "n_queries": args.n_queries,
        "n_corpus": n_corpus, "dim": dim, "n_bits": 8, "results": results,
    }
    if args.fixture == "clustered":
        curve.update({"n_clusters": args.n_clusters,
                      "cluster_std": args.cluster_std, "seed": args.seed})
        key = "clustered_mog"
    else:
        curve["sf_dir"] = args.sf
        key = "iid_sf"
    if args.algo == "ivf":
        key += "_ivf"
        curve["codebook"] = args.codebook
        if args.codebook == "kmeans":
            key += "_kmeans"
    path = os.path.join(REPO, "BENCH", "ann_recall.json")
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    existing: dict = {}
    if os.path.exists(path):
        with open(path) as fh:
            existing = json.load(fh)
        if "results" in existing:  # pre-round-4 single-curve layout
            existing = {"iid_sf": existing}
    existing[key] = curve
    with open(path, "w") as fh:
        json.dump(existing, fh, indent=1)

    print(f"\nANN ({args.algo}) recall@{args.k}, {args.fixture} fixture "
          f"({n_corpus} vectors, dim {dim}, {args.n_queries} queries)\n")
    if args.algo == "ivf":
        print("| n_centroids | n_probe | recall | corpus scanned per query |")
        print("|---|---|---|---|")
        for r in results:
            print(f"| {r['n_centroids']} | {r['n_probe']} | {r['recall']} | "
                  f"{100 * r['candidate_frac_of_bruteforce']:.1f}% |")
    else:
        print("| n_tables | probe_radius | recall | candidates vs brute force |")
        print("|---|---|---|---|")
        for r in results:
            print(
                f"| {r['n_tables']} | {r['probe_radius']} | {r['recall']} | "
                f"{100 * r['candidate_frac_of_bruteforce']:.1f}% |"
            )
    spark.stop()


if __name__ == "__main__":
    main()
