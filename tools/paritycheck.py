#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/paritycheck.py <sfDir> <outDir>
Expects `sbt "runMain graft.Verify <sfDir> <outDir>"` to have been run first.
Registers the sfDir parquet tables as DuckDB views, runs each oracle SQL, and
compares with the Spark parquet dump: schema (column names), row count, and
value-hash with columns sorted by name and rows sorted by all columns.
"""
import json
import sys
import glob
import os

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon_df(df):
    df = df[sorted(df.columns)]
    rows = []
    for t in df.itertuples(index=False):
        rows.append(tuple(repr(v) for v in t))
    return sorted(df.columns), sorted(rows)


def canon(rel):
    return canon_df(rel.fetchdf())


def canon_arrow(path_glob):
    # Spark-side read via pyarrow: keeps decimal.Decimal objects where
    # duckdb's fetchdf would coerce to float64 — the asymmetry that made
    # every decimal-output query hash-fail in round 1. Reading the spark
    # dump this way reproduces the driver's most adversarial path.
    import pyarrow.dataset as pads
    df = pads.dataset(glob.glob(path_glob)).to_table().to_pandas()
    return canon_df(df)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_bad += 1
            continue
        try:
            got_cols, got = canon_arrow(f"{spark_dir}/*.parquet")
            exp_cols, exp = canon(con.sql(sql))
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_bad += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: schema {got_cols} != {exp_cols}")
            n_bad += 1
        elif len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            n_bad += 1
        elif got != exp:
            bad = [i for i, (a, b) in enumerate(zip(got, exp)) if a != b][:3]
            print(f"FAIL {name}: value mismatch at sorted-rows {bad}")
            for i in bad[:2]:
                print(f"   spark : {got[i]}")
                print(f"   oracle: {exp[i]}")
            n_bad += 1
        else:
            print(f"OK   {name} ({len(got)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
