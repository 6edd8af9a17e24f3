#!/usr/bin/env python3
"""Local self-check mirroring the driver's DuckDB oracle compare.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

For each query result parquet written by graft.Verify, run the
corresponding oracleSql in DuckDB over the same tables and compare
(column names sorted, rows in emitted order, values exact)."""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)

def cell_eq(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if np.isnan(a) and np.isnan(b):
            return True
        return a == b
    return a == b

def compare(name, mine, oracle):
    mine, oracle = norm(mine), norm(oracle)
    if list(mine.columns) != list(oracle.columns):
        return f"COLS  mine={list(mine.columns)} oracle={list(oracle.columns)}"
    if len(mine) != len(oracle):
        return f"ROWS  mine={len(mine)} oracle={len(oracle)}"
    # normalize timestamps/dates to comparable python objects
    for c in mine.columns:
        for df in (mine, oracle):
            if str(df[c].dtype).startswith("datetime64"):
                df[c] = df[c].astype("datetime64[us]")
        if str(mine[c].dtype) != str(oracle[c].dtype):
            try:
                oracle[c] = oracle[c].astype(mine[c].dtype)
            except Exception:
                return f"DTYPE {c}: mine={mine[c].dtype} oracle={oracle[c].dtype}"
    for c in mine.columns:
        mv, ov = mine[c].tolist(), oracle[c].tolist()
        for i, (a, b) in enumerate(zip(mv, ov)):
            ok = cell_eq(a, b)
            if isinstance(ok, np.ndarray):
                ok = ok.all()
            if not ok:
                return f"VAL   {c}[{i}]: mine={a!r} oracle={b!r}"
    return None

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    results = {}
    dirs = sorted(d for d in os.listdir(out_dir)
                  if os.path.isdir(os.path.join(out_dir, d)))
    for name in dirs:
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            results[name] = "NO-OUTPUT"
            continue
        mine = pd.concat([pd.read_parquet(f) for f in files])
        if name not in oracles:
            results[name] = f"rows-only ({len(mine)} rows)" if len(mine) > 0 \
                else "rows-only EMPTY (check intent)"
            continue
        try:
            oracle = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE-SQL-ERROR {e}"
            continue
        diff = compare(name, mine, oracle)
        results[name] = "OK" if diff is None else f"MISMATCH {diff}"
    for k in oracles:
        if k not in results:
            results[k] = "MISSING-RESULT"
    npass = sum(1 for v in results.values()
                if v == "OK" or v.startswith("rows-only ("))
    for k in sorted(results):
        print(f"{results[k]:60s}  {k}")
    print(f"-- {npass}/{len(results)} pass")
    # Oracle output-type lint (VERDICT r10 item 5): run it on every
    # check so a new oracle can't silently reintroduce the HUGEINT
    # class. Same sf tables, same oracle_sql.json.
    import subprocess
    lint = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "lint_oracle_types.py"), sf_dir, out_dir])
    print(f"-- oracle type lint: {'clean' if lint.returncode == 0 else 'VIOLATIONS'}")
    sys.exit(0 if npass == len(results) and lint.returncode == 0 else 1)

main()
