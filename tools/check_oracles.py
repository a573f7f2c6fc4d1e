#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: read Verify output
parquet per query, run the oracle SQL in DuckDB over the same sf tables,
compare row count, sorted-column values. Usage:
    python3 tools/check_oracles.py /root/testdata/sf0.01 /tmp/verify_out
"""
import json, sys, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:]) or None  # optional query subset for fast iteration

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
ok, bad = [], []
for name, sql in sorted(oracle.items()):
    if only is not None and name not in only:
        continue
    pdir = f"{out_dir}/{name}"
    files = glob.glob(f"{pdir}/*.parquet")
    if not files:
        bad.append((name, "no spark output")); continue
    try:
        got = con.sql(f"SELECT * FROM '{pdir}/*.parquet'").df()
        want = con.sql(sql).df()
    except Exception as e:
        bad.append((name, f"duckdb error: {str(e)[:200]}")); continue
    gc, wc = sorted(got.columns), sorted(want.columns)
    if gc != wc:
        bad.append((name, f"columns differ: {gc} vs {wc}")); continue
    got, want = got[gc], want[wc]
    if len(got) != len(want):
        bad.append((name, f"rowcount {len(got)} vs {len(want)}")); continue
    mismatches = []
    for c in gc:
        g, w = got[c], want[c]
        try:
            eq = (g.values == w.values) | (pd.isna(g.values) & pd.isna(w.values))
            neq = int((~eq).sum())
        except Exception as e:
            neq, e0 = -1, e
        if neq != 0:
            dt = f"{g.dtype}/{w.dtype}"
            mismatches.append(f"{c}({dt}):{neq}")
    if mismatches:
        bad.append((name, "value mismatch " + ", ".join(mismatches)))
    else:
        ok.append((name, len(got), str(dict(zip(gc, [str(t) for t in got.dtypes])))[:120]))

for name, n, types in ok:
    print(f"OK    {name:20s} rows={n}")
for name, why in bad:
    print(f"FAIL  {name:20s} {why}")
print(f"\n{len(ok)} ok, {len(bad)} fail; queries without oracle: "
      f"{sorted(set(os.path.basename(d) for d in glob.glob(out_dir+'/*') if os.path.isdir(d)) - set(oracle))}")
sys.exit(1 if bad else 0)
