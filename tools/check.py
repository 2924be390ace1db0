#!/usr/bin/env python3
"""Local oracle差 harness: mimic the driver's DuckDB compare.

Usage: python3 tools/check.py [sfDir] [outDir]
Runs DuckDB on oracle_sql.json over the sf tables and compares each
query's result with the Spark parquet dump in outDir (columns sorted by
name, values compared exactly; floats reported with max abs diff).
"""
import json, sys, math
import duckdb
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
npass = nfail = 0
for name in sorted(oracle):
    if only is not None and name not in only:
        continue
    try:
        want = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"FAIL {name}: duckdb error: {e}")
        nfail += 1
        continue
    try:
        got = pd.read_parquet(f"{out}/{name}")
    except Exception as e:
        print(f"FAIL {name}: spark output missing: {e}")
        nfail += 1
        continue
    want = want.reindex(sorted(want.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    if list(want.columns) != list(got.columns):
        print(f"FAIL {name}: columns want={list(want.columns)} got={list(got.columns)}")
        nfail += 1
        continue
    if len(want) != len(got):
        print(f"FAIL {name}: rows want={len(want)} got={len(got)}")
        nfail += 1
        continue
    ok = True
    for c in want.columns:
        wv, gv = want[c], got[c]
        # The driver's hash is dtype-sensitive: int64 vs float64 with equal
        # values still hash-mismatches (round-1 f04). Check kind drift
        # FIRST — datetime-vs-int must fail, not get coerced below.
        if wv.dtype.kind != gv.dtype.kind:
            print(f"FAIL {name}: col {c}: dtype kind want={wv.dtype} got={gv.dtype}")
            ok = False
            continue
        # normalize same-kind timestamps (us vs ns resolution) for compare
        if "datetime" in str(wv.dtype):
            wv = pd.to_datetime(wv).astype("datetime64[us]")
            gv = pd.to_datetime(gv).astype("datetime64[us]")
        try:
            eq = (wv.values == gv.values) | (pd.isna(wv).values & pd.isna(gv).values)
        except Exception:
            eq = wv.astype(str).values == gv.astype(str).values
        if not eq.all():
            bad = (~eq).nonzero()[0][:3]
            detail = "; ".join(
                f"row{i} want={wv.iloc[i]!r} got={gv.iloc[i]!r}" for i in bad)
            if pd.api.types.is_float_dtype(wv):
                d = (pd.to_numeric(wv) - pd.to_numeric(gv)).abs().max()
                detail += f" (maxdiff={d})"
            print(f"FAIL {name}: col {c}: {int((~eq).sum())} diffs: {detail}")
            ok = False
    if ok:
        npass += 1
        print(f"PASS {name} ({len(want)} rows)")
    else:
        nfail += 1
print(f"\n{npass} pass, {nfail} fail, {len(oracle)} total")
sys.exit(1 if nfail else 0)
