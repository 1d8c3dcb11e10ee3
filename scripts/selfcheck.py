#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run Verify's parquet
outputs against the DuckDB oracle SQL and diff exactly.

Usage: python3 scripts/selfcheck.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
for p in glob.glob(os.path.join(sfdir, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))

n_pass = n_fail = 0
for name in sorted(oracles):
    sql = oracles[name]
    spark_dir = os.path.join(outdir, name)
    if not os.path.isdir(spark_dir):
        print(f"FAIL {name}: no spark output dir")
        n_fail += 1
        continue
    try:
        got = con.execute(
            f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").df()
        want = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {e}")
        n_fail += 1
        continue
    got = got.reindex(sorted(got.columns), axis=1)
    want = want.reindex(sorted(want.columns), axis=1)
    ok = True
    if list(got.columns) != list(want.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
        ok = False
    elif len(got) != len(want):
        print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
        ok = False
    else:
        for c in got.columns:
            a, b = got[c], want[c]
            try:
                eq = (a.isna() & b.isna()) | (a == b)
            except Exception:
                eq = a.astype(str) == b.astype(str)
            if not eq.all():
                i = (~eq).idxmax()
                print(f"FAIL {name}: col {c} row {i}: spark={a[i]!r} oracle={b[i]!r}"
                      f" (dtypes {a.dtype}/{b.dtype}, {int((~eq).sum())} diffs)")
                ok = False
                break
    if ok:
        print(f"PASS {name} ({len(got)} rows)")
        n_pass += 1
    else:
        n_fail += 1

print(f"\n{n_pass} pass / {n_fail} fail")
sys.exit(1 if n_fail else 0)
