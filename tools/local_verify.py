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
    # DRIVER SEMANTICS (round 16): sort RAW columns. The driver's
    # comparator lexsorts the columns as read, so a nested value (a
    # struct lands as dict, an array as ndarray/list) crashes its
    # sort_values with "unhashable type" and the row records red.
    # This stand-in used to cast object columns to str BEFORE sorting —
    # a permissive drift that passed the struct row the real gate
    # failed in round 15. Fail loudly and identically instead.
    # Inspect a bounded SAMPLE of non-null values, not just the first:
    # a column whose first row happens to be scalar but later rows hold
    # dicts/arrays would bypass this explicit driver-parity TypeError
    # and surface as an incidental pandas comparison error instead
    # (or, for homogeneous-looking data, a confusing mismatch).
    NESTED_SAMPLE = 64
    for c in df.columns:
        if df[c].dtype == object:
            for v in df[c].dropna().head(NESTED_SAMPLE):
                if (isinstance(v, (dict, list, tuple))
                        or type(v).__name__ == "ndarray"):
                    raise TypeError(
                        f"non-scalar column '{c}' ({type(v).__name__})"
                        " — the driver's comparator cannot sort nested"
                        " values; register a flattened row shape")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    # AFTER the raw sort, stringify remaining object columns for the
    # value compare only (None vs NaN canonicalization) — scalar
    # strings sort identically raw or cast, so this cannot re-admit
    # what the sort above rejects
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df


def selftest() -> int:
    """The gate-drift regression test: a struct-shaped (dict) column and
    an array column must FAIL canon exactly like the driver's sort —
    also when the first value of the column is a SCALAR and the nested
    value appears later (the head(1) blind spot)."""
    for bad in [{"a": 1}, [1, 2]]:
        for p in ([bad, bad], ["scalar-first", bad]):
            df = pd.DataFrame({"k": [2, 1], "p": p})
            try:
                canon(df)
            except TypeError as e:
                print(f"selftest OK: {type(bad).__name__} column rejected"
                      f" (first={type(p[0]).__name__}) ({e})")
            else:
                print(f"selftest FAIL: {type(bad).__name__} column passed"
                      f" canon (first={type(p[0]).__name__}) — the stand-in"
                      " is more permissive than the driver again")
                return 1
    flat = canon(pd.DataFrame({"k": [2, 1], "s": ["b", None]}))
    assert list(flat["k"]) == [1, 2], "raw sort must still order scalars"
    print("selftest OK: scalar frame sorts")
    return 0


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
        try:
            got = canon(pd.concat([pd.read_parquet(f) for f in files]))
            want = canon(con.execute(oracle[name]).fetchdf())
        except TypeError as e:
            # the driver records this row red with the traceback as err —
            # mirror it as a per-row FAIL, never a pass
            print(f"FAIL {name}: {e}")
            fails += 1
            continue
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
    if len(sys.argv) == 2 and sys.argv[1] == "--selftest":
        sys.exit(selftest())
    sys.exit(main(sys.argv[1], sys.argv[2]))
