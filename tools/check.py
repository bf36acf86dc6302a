#!/usr/bin/env python3
"""Local correctness harness mimicking the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py [sf_dir] [out_dir] [--skip-run] [names...]
"""
import json, subprocess, sys, glob, os

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
rest = sys.argv[3:]
skip_run = "--skip-run" in rest
only = [a for a in rest if not a.startswith("--")]

if not skip_run:
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {sf} {out}'],
        cwd="/root/repo", capture_output=True, text=True, timeout=1800)
    for line in r.stdout.splitlines():
        if "[verify]" in line or "[error]" in line:
            print(line)
    for line in r.stderr.splitlines():
        if "[verify]" in line:
            print(line)

import duckdb
con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails, passes = [], []
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    try:
        got = con.execute(
            f"SELECT * FROM '{out}/{name}/*.parquet'").fetchdf()
    except Exception as e:
        fails.append((name, f"no spark output: {e}")); continue
    try:
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        fails.append((name, f"oracle error: {e}")); continue
    # driver-style compare: sort columns by name, then compare values
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        fails.append((name, f"columns differ: {list(got.columns)} vs {list(exp.columns)}"))
        continue
    if len(got) != len(exp):
        fails.append((name, f"row count {len(got)} vs {len(exp)}")); continue
    # exact compare (driver hashes values)
    import pandas as pd
    diff_cols = []
    for c in got.columns:
        a, b = got[c], exp[c]
        try:
            eq = (a.eq(b) | (a.isna() & b.isna())).all()
        except Exception:
            eq = list(a) == list(b)
        if not eq:
            # find first mismatch
            for i in range(len(a)):
                av, bv = a.iloc[i], b.iloc[i]
                if (av != bv) and not (pd.isna(av) and pd.isna(bv)):
                    diff_cols.append(f"{c}[{i}]: {av!r} vs {bv!r}")
                    break
    if diff_cols:
        fails.append((name, f"{len(got)} rows; value diffs: " + "; ".join(diff_cols[:4])))
    else:
        passes.append((name, len(got)))

for n, c in passes:
    print(f"PASS {n} ({c} rows)")
for n, msg in fails:
    print(f"FAIL {n}: {msg}")
print(f"\n{len(passes)} passed, {len(fails)} failed")
sys.exit(1 if fails else 0)
