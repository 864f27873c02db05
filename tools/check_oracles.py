"""Local replica of the driver's correctness gate.

Runs every `queries()[name]` through Spark and the matching `oracle_sql()`
through DuckDB on the same parquet tables, then compares row count, column
names, and order-insensitive values.

Comparison is deliberately **pandas-typed** (duckdb `.df()` / spark
`.toPandas()`) to emulate the driver's value hash: round 1 proved the driver
distinguishes int64 from float64 (a10: DuckDB types SUM(BIGINT) as HUGEINT,
which `.df()` converts to float64 -> hash mismatch even though str() values
agree) while NOT distinguishing int32 from int64 (w1 row_number passed).
Canonicalization here therefore keys on dtype KIND (int vs float vs object),
not width — any kind divergence between the Spark and DuckDB frames is a
failure even when the stringified values would agree.

Usage: python tools/check_oracles.py [--sf /root/testdata/sf0.01] [--only g1_pagerank,...]
"""

from __future__ import annotations

import argparse
import datetime as _dt
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def canon_frame(df) -> tuple[list[str], list[str], list[str]]:
    """(sorted column names, per-column dtype kinds, sorted canonical rows)."""
    import numpy as np
    import pandas as pd

    cols = sorted(df.columns)
    df = df[cols]
    kinds = []
    canon_cols = []
    for c in cols:
        s = df[c]
        k = s.dtype.kind  # i/u int, f float, O object, M datetime, b bool
        if k in "iu":
            kinds.append("int")
            canon_cols.append(s.map(lambda v: "\x00NULL" if pd.isna(v) else str(int(v))))
        elif k == "f":
            kinds.append("float")

            def cf(v):
                if pd.isna(v):
                    return "\x00NULL"
                v = float(v)
                return "NaN" if math.isnan(v) else repr(v)

            canon_cols.append(s.map(cf))
        elif k == "b":
            kinds.append("bool")
            canon_cols.append(s.map(lambda v: "\x00NULL" if pd.isna(v) else str(bool(v))))
        elif k == "M":
            # DATE columns arrive as datetime64 from DuckDB but as python
            # date objects from Spark (round-1 driver treated them equal) —
            # canonicalize midnight timestamps to the date form.
            kinds.append("datetime")

            def cm(v):
                if pd.isna(v):
                    return "\x00NULL"
                ts = pd.Timestamp(v)
                return ts.date().isoformat() if ts == ts.normalize() else ts.isoformat()

            canon_cols.append(s.map(cm))
        elif k == "O" and s.map(lambda v: isinstance(v, _dt.date) and not isinstance(v, _dt.datetime), na_action="ignore").fillna(True).all():
            kinds.append("datetime")
            canon_cols.append(s.map(lambda v: "\x00NULL" if v is None else v.isoformat()))
        else:
            kinds.append("obj")

            def co(v):
                if v is None or (isinstance(v, float) and math.isnan(v)):
                    return "\x00NULL"
                if isinstance(v, (bytes, bytearray)):
                    return bytes(v).hex()
                if isinstance(v, float):
                    return repr(v)
                if isinstance(v, (list, tuple, np.ndarray)):
                    return "[" + ",".join(co(x) for x in v) + "]"
                return str(v)

            canon_cols.append(s.map(co))
    rows = ["\x01".join(vals) for vals in zip(*canon_cols)] if cols else []
    rows.sort()
    return cols, kinds, rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--only", default=None)
    ap.add_argument("--first", type=int, default=None, help="only the first N registry entries (driver window)")
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument(
        "--out",
        default=None,
        help="write a CORRECTNESS_r*-shaped JSON artifact (per-query rows/schema/hash match)",
    )
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
    if args.first:
        names = names[: args.first]
    if args.only:
        names = [n for n in names if n in set(args.only.split(","))]

    n_ok = n_bad = n_rowsonly = 0
    results: dict[str, dict] = {}

    def record(name, *, rows_match, schema_match, hash_match, spark_rows, oracle_rows, err,
               rows_only=False):
        results[name] = {
            "rows_match": rows_match,
            "schema_match": schema_match,
            "hash_match": hash_match,
            "spark_rows": spark_rows,
            "oracle_rows": oracle_rows,
            "err": err,
        }
        if rows_only:
            results[name]["rows_only"] = True

    for name in names:
        t0 = time.time()
        try:
            spdf = qs[name](spark, args.sf).toPandas()
        except Exception as ex:
            err = f"spark error: {str(ex).splitlines()[0][:200]}"
            print(f"FAIL {name}: {err}")
            record(name, rows_match=False, schema_match=False, hash_match=False,
                   spark_rows=None, oracle_rows=None, err=err)
            n_bad += 1
            continue
        if name not in oracles:
            print(f"ROWS {name}: {len(spdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            # rows_match=None (not a tautological True): nothing was
            # compared for no-oracle entries, and the artifact must not be
            # readable as a verified row-count match (round-5 advisory)
            record(name, rows_match=None, schema_match=None, hash_match=None,
                   spark_rows=len(spdf), oracle_rows=None, err=None,
                   rows_only=True)
            n_rowsonly += 1
            continue
        try:
            opdf = con.execute(oracles[name]).df()
        except Exception as ex:
            err = f"duckdb error: {str(ex).splitlines()[0][:160]}"
            print(f"FAIL {name}: {err}")
            record(name, rows_match=False, schema_match=False, hash_match=False,
                   spark_rows=len(spdf), oracle_rows=None, err=err)
            n_bad += 1
            continue

        sc, sk, sv = canon_frame(spdf)
        oc, ok_, ov = canon_frame(opdf)
        if sc != oc:
            print(f"FAIL {name}: columns differ spark={sc} duckdb={oc}")
            record(name, rows_match=len(sv) == len(ov), schema_match=False, hash_match=False,
                   spark_rows=len(sv), oracle_rows=len(ov), err="columns differ")
            n_bad += 1
            continue
        if sk != ok_:
            kd = [(c, a, b) for c, a, b in zip(sc, sk, ok_) if a != b]
            print(f"FAIL {name}: dtype kinds differ (spark vs duckdb): {kd}")
            record(name, rows_match=len(sv) == len(ov), schema_match=False, hash_match=False,
                   spark_rows=len(sv), oracle_rows=len(ov), err=f"dtype kinds differ: {kd}")
            n_bad += 1
            continue
        if len(sv) != len(ov):
            print(f"FAIL {name}: rowcount spark={len(sv)} duckdb={len(ov)}")
            record(name, rows_match=False, schema_match=True, hash_match=False,
                   spark_rows=len(sv), oracle_rows=len(ov), err="rowcount differs")
            n_bad += 1
            continue
        diff = [i for i, (a, b) in enumerate(zip(sv, ov)) if a != b]
        if diff:
            i = diff[0]
            print(f"FAIL {name}: {len(diff)}/{len(sv)} rows differ; first: spark={sv[i][:160]!r} duckdb={ov[i][:160]!r}")
            record(name, rows_match=True, schema_match=True, hash_match=False,
                   spark_rows=len(sv), oracle_rows=len(ov),
                   err=f"{len(diff)}/{len(sv)} rows differ")
            n_bad += 1
            continue
        print(f"OK   {name}: {len(sv)} rows match exactly [{time.time()-t0:.1f}s]")
        record(name, rows_match=True, schema_match=True, hash_match=True,
               spark_rows=len(sv), oracle_rows=len(ov), err=None)
        n_ok += 1

    print(f"\n{n_ok} ok, {n_rowsonly} rows-only, {n_bad} FAILED")
    if args.out:
        import json

        with open(args.out, "w") as f:
            json.dump(results, f, indent=1, sort_keys=False)
        print(f"wrote {args.out} ({len(results)} entries)")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
