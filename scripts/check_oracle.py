#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB oracle compare.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir> [query ...]

For each query in <verifyOutDir>/oracle_sql.json (or only the names
passed as extra args): run the SQL in DuckDB
with views over <sfDir>/*.parquet, load the engine's parquet dump,
canonicalize both (columns sorted by name, rows sorted by all columns),
and compare cell-by-cell (exact for non-floats, 1e-9-relative for
floats, which is stricter than the rounding in the queries).
"""
import json
import sys

import duckdb
import pandas as pd
import numpy as np

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sfdir: str, outdir: str, only=None) -> int:
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    if only:
        missing = set(only) - set(oracle)
        if missing:
            print(f"FAIL unknown query names: {sorted(missing)}")
            return 1
        oracle = {k: v for k, v in oracle.items() if k in set(only)}
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        try:
            got = pd.read_parquet(f"{outdir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: engine output unreadable: {e}")
            failures += 1
            continue
        want, got = canon(want), canon(got)
        if list(want.columns) != list(got.columns):
            print(f"FAIL {name}: columns differ: oracle={list(want.columns)} engine={list(got.columns)}")
            failures += 1
            continue
        if len(want) != len(got):
            print(f"FAIL {name}: row counts differ: oracle={len(want)} engine={len(got)}")
            failures += 1
            continue
        ok = True
        for c in want.columns:
            a, b = want[c].to_numpy(), got[c].to_numpy()
            # int-vs-float kind mismatch = schema mismatch at the driver
            # (its compare hashes exact values), even if numerically close
            ak, bk = a.dtype.kind, b.dtype.kind
            if ak != 'O' and bk != 'O' and (ak in 'iu') != (bk in 'iu'):
                print(f"FAIL {name}: column {c}: dtype kind mismatch "
                      f"oracle={a.dtype} engine={b.dtype}")
                ok = False
                failures += 1
                break
            if np.issubdtype(a.dtype, np.floating) or np.issubdtype(b.dtype, np.floating):
                af = a.astype(float); bf = b.astype(float)
                bad = ~(np.isclose(af, bf, rtol=1e-9, atol=1e-9) |
                        (np.isnan(af) & np.isnan(bf)))
            else:
                bad = a != b
            if bad.any():
                i = int(np.argmax(bad))
                print(f"FAIL {name}: column {c}: {int(bad.sum())}/{len(a)} cells differ; "
                      f"first at row {i}: oracle={a[i]!r} engine={b[i]!r}")
                ok = False
                failures += 1
                break
        if ok:
            print(f"OK   {name}: {len(want)} rows, {len(want.columns)} cols")
    print(f"\n{len(oracle)} oracle queries, {failures} failures")
    return 1 if failures else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3:] or None))
