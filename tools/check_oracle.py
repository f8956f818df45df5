#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare.

Usage: check_oracle.py <sfDir> <verifyOutDir> [query ...]
For each query with an oracle_sql entry: load the Spark result parquet,
run the oracle SQL over the fixture tables, compare row counts, column
names (sorted), and a canonical hash of all values.
"""
import json, sys, math
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)

fails = 0
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    try:
        spark_rel = con.execute(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        s_cols = [d[0] for d in spark_rel.description]
        s_rows = spark_rel.fetchall()
        o_rel = con.execute(sql)
        o_cols = [d[0] for d in o_rel.description]
        o_rows = o_rel.fetchall()
    except Exception as e:
        print(f"FAIL {name}: exception {e}")
        fails += 1
        continue
    ok_rows = len(s_rows) == len(o_rows)
    ok_cols = sorted(s_cols) == sorted(o_cols)
    s_ix = [s_cols.index(c) for c in sorted(s_cols)]
    o_ix = [o_cols.index(c) for c in sorted(o_cols)]
    s_vals = sorted(tuple(canon(r[i]) for i in s_ix) for r in s_rows)
    o_vals = sorted(tuple(canon(r[i]) for i in o_ix) for r in o_rows)
    ok_hash = s_vals == o_vals
    if ok_rows and ok_cols and ok_hash:
        print(f"PASS {name} ({len(s_rows)} rows)")
    else:
        fails += 1
        print(f"FAIL {name}: rows {len(s_rows)}/{len(o_rows)} cols_ok={ok_cols} hash_ok={ok_hash}")
        if not ok_cols:
            print(f"  spark cols: {sorted(s_cols)}\n  oracle cols: {sorted(o_cols)}")
        if ok_cols and not ok_hash:
            diff = [ (a,b) for a,b in zip(s_vals, o_vals) if a != b ][:3]
            for a, b in diff:
                print(f"  spark : {a}\n  oracle: {b}")
sys.exit(1 if fails else 0)
