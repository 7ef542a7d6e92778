#!/usr/bin/env python3
"""Dev-side mirror of the driver's DuckDB oracle compare.

Usage: oracle_check.py <sfDir> <outDir> [query ...]
Loads every parquet table in sfDir as a DuckDB view, runs each
oracle_sql.json entry, and compares rows/schema/hash against the
Spark dump in outDir/<name>. Sorts columns by name, rows by all
columns, and hashes the stringified frame — same spirit as the
driver's gate.
"""
import sys, json, glob, os, hashlib
import duckdb
import pandas as pd

sf, out = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:]) or None

con = duckdb.connect()
for p in glob.glob(os.path.join(sf, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(os.path.join(out, "oracle_sql.json")))
fails = 0
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    spath = os.path.join(out, name)
    if not os.path.isdir(spath):
        print(f"{name}: MISSING spark dump")
        fails += 1
        continue
    spark_df = pd.concat([pd.read_parquet(f)
                          for f in glob.glob(spath + "/*.parquet")])
    try:
        ora_df = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR {e}")
        fails += 1
        continue

    def canon(df):
        df = df[sorted(df.columns)]
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
        return df

    s, o = canon(spark_df), canon(ora_df)
    rows = len(s) == len(o)
    schema = list(s.columns) == list(o.columns)
    def h(df):
        return hashlib.md5(df.astype(str).to_csv(index=False).encode()).hexdigest()
    hmatch = rows and schema and h(s) == h(o)
    status = "OK" if (rows and schema and hmatch) else "FAIL"
    if status == "FAIL":
        fails += 1
        print(f"{name}: {status} rows {len(s)}/{len(o)} schema={schema} hash={hmatch}")
        if rows and schema:
            neq = (s.astype(str) != o.astype(str)).any(axis=1)
            print(s[neq].head(3))
            print(o[neq].head(3))
    else:
        print(f"{name}: OK ({len(s)} rows)")
sys.exit(1 if fails else 0)
