"""Local replica of the driver's correctness gate.

Runs every `queries()[name]` through Spark and the matching `oracle_sql()`
through DuckDB on the same parquet tables, then compares row count, column
names, and order-insensitive values (exact after canonicalization). Any
mismatch here would also fail the driver's value-hash comparison.

Usage: python tools/check_oracles.py [--sf /root/testdata/sf0.01] [--only g1_pagerank,...]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def canon_cell(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # canonical shortest repr of the double
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = ["\x01".join(canon_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--only", default=None)
    ap.add_argument("--cores", type=int, default=8)
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as entrymod
    from scalemine_spark.session import get_spark

    spark = get_spark("check-oracles", cores=args.cores, shuffle_partitions=2 * args.cores)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for name in TABLES:
        p = f"{args.sf}/{name}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = list(qs)
    if args.only:
        names = [n for n in names if n in set(args.only.split(","))]

    n_ok = n_bad = n_rowsonly = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            n_bad += 1
            continue
        if name not in oracles:
            print(f"ROWS {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rowsonly += 1
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {str(ex).splitlines()[0][:160]}")
            n_bad += 1
            continue

        sc, sv = canon_rows(scols, srows)
        oc, ov = canon_rows(ocols, orows)
        if sc != oc:
            print(f"FAIL {name}: columns differ spark={sc} duckdb={oc}")
            n_bad += 1
            continue
        if len(sv) != len(ov):
            print(f"FAIL {name}: rowcount spark={len(sv)} duckdb={len(ov)}")
            n_bad += 1
            continue
        diff = [i for i, (a, b) in enumerate(zip(sv, ov)) if a != b]
        if diff:
            i = diff[0]
            print(f"FAIL {name}: {len(diff)}/{len(sv)} rows differ; first: spark={sv[i][:160]!r} duckdb={ov[i][:160]!r}")
            n_bad += 1
            continue
        print(f"OK   {name}: {len(sv)} rows match exactly [{time.time()-t0:.1f}s]")
        n_ok += 1

    print(f"\n{n_ok} ok, {n_rowsonly} rows-only, {n_bad} FAILED")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
