"""A/B: J9 asof_join (range-join + partial-agg) vs J9b asof_join_merge
(union-sort-merge, zero fan-out) under key skew — the crossover evidence the
round-3 verdict asked for (#7).

Workload: 10^6 probes over K uniform keys (s_normal snapshots each) plus ONE
hot key holding `s_hot` snapshots; `hot_frac` of the probes hit the hot key.
The range-join arm generates s_hot fan-out rows per hot probe map-side before
its partial aggregate collapses them, so its cost scales with
hot_probes x s_hot; the merge arm shuffles L+R rows once regardless. Sweeping
s_hot exposes the crossover. All data is deterministic (spark.range +
xxhash64-derived pseudo-randoms, no RNG state).

Results match across arms (count + checksum asserted per sweep point).
Writes BENCH/ab_asof.json.

Usage: python tools/ab_asof.py [--cores 8] [--probes 1000000]
           [--s-hot 100,1000,10000] [--skip-range-above 20000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--probes", type=int, default=1_000_000)
    ap.add_argument("--keys", type=int, default=10_000)
    ap.add_argument("--s-normal", type=int, default=10)
    ap.add_argument("--hot-frac", type=float, default=0.1)
    ap.add_argument("--s-hot", default="100,1000,10000")
    ap.add_argument(
        "--skip-range-above", type=int, default=20_000,
        help="skip the range-join arm when hot_probes*s_hot exceeds this many "
             "millions of fan-out rows (it would run for hours — that's the point)",
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from scalemine_spark.operators.joins import asof_join, asof_join_merge
    from scalemine_spark.session import get_spark

    spark = get_spark("ab-asof", cores=args.cores, shuffle_partitions=2 * args.cores)
    spark.sparkContext.setLogLevel("ERROR")

    K, HOT = args.keys, args.keys  # hot key id == K (outside the uniform range)
    ts_span = 1_000_000

    def pseudo(col, salt, mod):
        return F.pmod(F.xxhash64(col, F.lit(salt)), F.lit(mod))

    # uniform right side: K keys x s_normal snapshots, ts spread over the span
    r_norm = spark.range(K * args.s_normal).select(
        (F.col("id") % K).alias("k"),
        pseudo(F.col("id"), 1, ts_span).alias("ts"),
        (F.col("id") * 7 % 1000).cast("double").alias("v"),
    )
    n_hot_probes = int(args.probes * args.hot_frac)
    probes = spark.range(args.probes).select(
        F.when(F.col("id") < n_hot_probes, F.lit(HOT))
        .otherwise(pseudo(F.col("id"), 2, K))
        .alias("k"),
        pseudo(F.col("id"), 3, ts_span).alias("ts"),
    ).repartition(2 * args.cores).persist()
    probes.count()

    results = []
    for s_hot in [int(x) for x in args.s_hot.split(",")]:
        r_hot = spark.range(s_hot).select(
            F.lit(HOT).alias("k"),
            pseudo(F.col("id"), 4, ts_span).alias("ts"),
            (F.col("id") % 1000).cast("double").alias("v"),
        )
        right = r_norm.unionByName(r_hot).repartition(2 * args.cores).persist()
        right.count()

        point = {"s_hot": s_hot, "hot_probes": n_hot_probes,
                 "fanout_rows_hot_M": round(n_hot_probes * s_hot / 1e6, 1)}
        checks = {}
        for label, fn in [("merge", asof_join_merge), ("range_agg", asof_join)]:
            if label == "range_agg" and n_hot_probes * s_hot / 1e6 > args.skip_range_above:
                point[f"t_{label}"] = None
                point["range_agg_skipped"] = (
                    f"fan-out {point['fanout_rows_hot_M']}M rows > cap"
                )
                continue
            t0 = time.monotonic()
            out = fn(probes, right, on="k", left_ts="ts", right_ts="ts")
            row = out.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("r_v").alias("sv"),
                F.sum("r_ts").alias("st"),
            ).collect()[0]
            point[f"t_{label}"] = round(time.monotonic() - t0, 2)
            checks[label] = (int(row["n"]), float(row["sv"] or 0), int(row["st"] or 0))
        if len(checks) == 2:
            assert checks["merge"] == checks["range_agg"], checks
            point["results_match"] = True
        results.append(point)
        print(f"  {point}", file=sys.stderr)
        right.unpersist()

    summary = {
        "probes": args.probes, "keys": K, "s_normal": args.s_normal,
        "hot_frac": args.hot_frac, "cores": args.cores, "sweep": results,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "ab_asof.json"), "w") as fh:
        json.dump(summary, fh, indent=1)
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
