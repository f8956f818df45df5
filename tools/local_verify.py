#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: read each
out/<name> parquet written by graft.Verify, run the matching oracle SQL in
DuckDB over the same fixture dir, and compare as sorted-column, sorted-row
value sets (like the driver: columns sorted by name before hashing).

Usage: python3 tools/local_verify.py <sfDir> <outDir>
"""
import json
import sys
import glob

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: timestamps -> iso strings, floats stay float64
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    fails = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            fails += 1
            continue
        got = canon(pd.concat([pd.read_parquet(f) for f in files]))
        want = canon(con.execute(oracle[name]).fetchdf())
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            fails += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            fails += 1
            continue
        eq = got.equals(want)
        if not eq:
            diff = (got != want) & ~(got.isna() & want.isna())
            bad = diff.any(axis=1)
            print(f"FAIL {name}: {int(bad.sum())} mismatched rows; first:")
            print(pd.concat([got[bad].head(3), want[bad].head(3)], keys=["got", "want"]))
            fails += 1
        else:
            print(f"OK   {name}: {len(got)} rows, {len(got.columns)} cols")
    # queries with no oracle: rows-only note
    spark_only = {d.split('/')[-1] for d in glob.glob(f"{out_dir}/*") if not d.endswith(".json")}
    for name in sorted(spark_only - set(oracle)):
        n = sum(len(pd.read_parquet(f)) for f in glob.glob(f"{out_dir}/{name}/*.parquet"))
        print(f"NOTE {name}: no oracle, rows={n}")
    print(f"{'ALL GREEN' if fails == 0 else f'{fails} FAILURES'}")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
