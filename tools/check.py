#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness compare.

Usage: python3 tools/check.py [sf_dir] [verify_out_dir]

Reads <out>/oracle_sql.json, runs each SQL in DuckDB with views over the
sf_dir parquet tables, reads the Spark result parquet from <out>/<name>,
and compares: column names, dtypes, row count, and sorted values.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # canonicalize for sorting: stringify everything
    s = df.astype(str)
    order = s.sort_values(by=list(s.columns)).index
    return df.loc[order].reset_index(drop=True)

def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # explicit engine-side failure records (query threw before output)
    err_path = f"{out_dir}/errors.json"
    errors = json.load(open(err_path)) if os.path.exists(err_path) else {}
    n_ok = n_bad = 0
    only = sys.argv[3:] or None
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        if name in errors:
            print(f"FAIL {name}: query errored: {errors[name][:200]}")
            n_bad += 1
            continue
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"FAIL {name}: no spark output")
            n_bad += 1
            continue
        try:
            got = pd.concat([pd.read_parquet(f) for f in spark_files])
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {str(e)[:300]}")
            n_bad += 1
            continue
        probs = []
        if sorted(got.columns) != sorted(want.columns):
            probs.append(f"cols spark={sorted(got.columns)} oracle={sorted(want.columns)}")
        elif len(got) != len(want):
            probs.append(f"rows spark={len(got)} oracle={len(want)}")
        else:
            g, w = norm(got), norm(want)
            for c in g.columns:
                if str(g[c].dtype) != str(w[c].dtype):
                    probs.append(f"dtype[{c}] spark={g[c].dtype} oracle={w[c].dtype}")
            if not probs:
                neq = (g.astype(str) != w.astype(str)).any(axis=1)
                if neq.any():
                    i = neq.idxmax()
                    probs.append(f"{int(neq.sum())} differing rows; first @{i}:\n"
                                 f"  spark : {g.loc[i].to_dict()}\n"
                                 f"  oracle: {w.loc[i].to_dict()}")
        if probs:
            print(f"FAIL {name}: " + "; ".join(probs))
            n_bad += 1
        else:
            print(f"ok   {name} ({len(got)} rows)")
            n_ok += 1
    # errored queries with no oracle entry (rows-only checks) must
    # still surface as failures, not vanish
    for name, err in sorted(errors.items()):
        if name not in oracle and (not only or name in only):
            print(f"FAIL {name}: query errored (no oracle): {err[:200]}")
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} fail")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
