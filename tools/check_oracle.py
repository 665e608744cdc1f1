#!/usr/bin/env python3
"""Dev-side replica of the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py /tmp/verify_out /root/testdata/sf0.01
Loads each <name>/ parquet produced by graft.Verify, runs the matching
oracle SQL in DuckDB over the same sf tables, and compares values
(rows sorted, columns sorted by name).
"""
import sys, json, glob, math
import duckdb
import pandas as pd

out_dir, sf_dir = sys.argv[1], sys.argv[2]
oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, tuple)) or type(v).__name__ == 'ndarray' else v)
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="first").reset_index(drop=True)
    return df

fails = 0
for name, sql in oracle.items():
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
    try:
        duck_df = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}"); fails += 1; continue
    s, d = norm(spark_df), norm(duck_df)
    if list(s.columns) != list(d.columns):
        print(f"FAIL {name}: columns {list(s.columns)} vs {list(d.columns)}"); fails += 1; continue
    if len(s) != len(d):
        print(f"FAIL {name}: rows {len(s)} vs {len(d)}"); fails += 1; continue
    mism = []
    for c in s.columns:
        a, b = s[c].tolist(), d[c].tolist()
        for i, (x, y) in enumerate(zip(a, b)):
            eq = (x == y) or (x is None and y is None)
            try:
                if isinstance(x, float) and isinstance(y, float):
                    eq = (math.isnan(x) and math.isnan(y)) or x == y
            except Exception:
                pass
            if not eq and not (pd.isna(x) and pd.isna(y)):
                mism.append((c, i, x, y))
                break
    if mism:
        print(f"FAIL {name}: first mismatch {mism[0]}"); fails += 1
    else:
        print(f"PASS {name}: {len(s)} rows, {len(s.columns)} cols exact")
print("ALL PASS" if fails == 0 else f"{fails} FAILURES")
sys.exit(1 if fails else 0)
