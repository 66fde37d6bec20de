#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the same parquet tables and compare to the Spark result
(columns sorted by name, rows sorted, values compared)."""
import sys, json, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
ok = fail = 0
for name in sorted(os.listdir(out_dir)):
    d = f"{out_dir}/{name}"
    if not os.path.isdir(d): continue
    spark_df = pd.concat([pd.read_parquet(p) for p in glob.glob(f"{d}/*.parquet")])
    if name not in oracle:
        print(f"{name}: rows-only check -> {len(spark_df)} rows", "OK" if len(spark_df)>0 else "EMPTY")
        continue
    try:
        duck_df = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"{name}: ORACLE ERROR {str(e)[:160]}"); fail += 1; continue
    def canon(df):
        df = df[sorted(df.columns)].copy()
        return df.sort_values(by=list(df.columns)).reset_index(drop=True)
    a, b = canon(spark_df), canon(duck_df)
    if list(a.columns) != list(b.columns):
        print(f"{name}: SCHEMA MISMATCH spark={list(a.columns)} duck={list(b.columns)}"); fail += 1; continue
    if len(a) != len(b):
        print(f"{name}: ROWCOUNT {len(a)} vs {len(b)}"); fail += 1; continue
    eq = a.astype(str).equals(b.astype(str))
    if eq:
        print(f"{name}: OK ({len(a)} rows)"); ok += 1
    else:
        diff = (a.astype(str) != b.astype(str)).any(axis=1)
        print(f"{name}: VALUE MISMATCH ({diff.sum()}/{len(a)} rows differ)")
        print("  spark:", a[diff].head(3).to_dict('records'))
        print("  duck :", b[diff].head(3).to_dict('records'))
        fail += 1
print(f"\n{ok} ok, {fail} failed")
sys.exit(1 if fail else 0)
