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
    # pass the name filter through to Verify: a named check then runs
    # only those queries (~2 min) instead of the full suite (~10 min)
    names = " " + " ".join(only) if only else ""
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {sf} {out}{names}'],
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
        # read spark output with pyarrow (NOT duckdb): keeps decimal /
        # int widths as written, like the driver's hash sees them
        import pandas as pd
        parts = sorted(glob.glob(f"{out}/{name}/*.parquet"))
        got = pd.concat([pd.read_parquet(p) for p in parts], ignore_index=True)
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
    # exact compare (driver hashes values, type-sensitively: decimal vs
    # float vs int mismatches hash-fail even when numerically equal)
    import pandas as pd
    import numpy as np
    diff_cols = []
    for c in got.columns:
        a, b = got[c], exp[c]
        # timestamps: driver normalizes units (INT96→ns vs duckdb µs both
        # hash-matched in r1), so compare values, not units; same for
        # date32→object(date) vs duckdb datetime64
        def is_dt(s):
            return str(s.dtype).startswith("datetime64") or (
                str(s.dtype) == "object" and len(s) and
                all(type(v).__name__ in ("date", "datetime", "Timestamp")
                    for v in s if v is not None))
        if is_dt(a) and is_dt(b):
            a = pd.to_datetime(a).astype("datetime64[us]")
            b = pd.to_datetime(b).astype("datetime64[us]")
            if not (a.eq(b) | (a.isna() & b.isna())).all():
                i = int((~(a.eq(b) | (a.isna() & b.isna()))).to_numpy().argmax())
                diff_cols.append(f"{c}[{i}]: {a.iloc[i]!r} vs {b.iloc[i]!r}")
            continue
        if str(a.dtype) != str(b.dtype):
            diff_cols.append(f"{c}: dtype {a.dtype} vs {b.dtype}")
            continue
        if str(a.dtype) == "object" and len(a):
            ta = {type(v).__name__ for v in a if v is not None}
            tb = {type(v).__name__ for v in b if v is not None}
            if ta != tb:
                diff_cols.append(f"{c}: value types {ta} vs {tb}")
                continue
            # array-valued cells (list columns): normalize to nested
            # tuples so Series.eq reduces to scalars (ndarray == ndarray
            # is ambiguous for some element dtypes, e.g. string arrays)
            def _norm(v):
                if isinstance(v, (np.ndarray, list, tuple)):
                    return tuple(_norm(x) for x in v)
                return v
            if any(isinstance(v, (np.ndarray, list)) for v in a if v is not None):
                a = a.map(_norm)
                b = b.map(_norm)
        if str(a.dtype) == "float64":
            av, bv = a.to_numpy(), b.to_numpy()
            eq = bool(np.all((av.view("int64") == bv.view("int64"))
                             | (np.isnan(av) & np.isnan(bv))))
            if not eq:
                i = int(np.argmax(~((av.view("int64") == bv.view("int64"))
                                    | (np.isnan(av) & np.isnan(bv)))))
                diff_cols.append(f"{c}[{i}]: {av[i]!r} vs {bv[i]!r} (bitwise)")
            continue
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
