#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify, then
run each oracle SQL in DuckDB over the same parquet tables and compare
(sorted columns, sorted rows, exact values)."""
import sys, os, json, glob, subprocess
import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft-verify"
RUN_VERIFY = os.environ.get("SKIP_VERIFY") != "1"

if RUN_VERIFY:
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {SF_DIR} {OUT}'],
        cwd="/root/repo", capture_output=True, text=True, timeout=3600)
    if "error" in r.stdout.lower() and "[error] (run" in r.stdout:
        print(r.stdout[-3000:])

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    p = f"{SF_DIR}/{t}.parquet"
    if os.path.exists(p):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

ok, bad = [], []
for name in sorted(oracle):
    pdir = f"{OUT}/{name}"
    if not os.path.exists(pdir):
        bad.append((name, "spark result missing")); continue
    try:
        spark_df = con.sql(f"SELECT * FROM '{pdir}/*.parquet'").df()
    except Exception as e:
        bad.append((name, f"read: {e}")); continue
    try:
        duck_df = con.sql(oracle[name]).df()
    except Exception as e:
        bad.append((name, f"oracle sql: {e}")); continue
    a = spark_df.reindex(sorted(spark_df.columns), axis=1)
    b = duck_df.reindex(sorted(duck_df.columns), axis=1)
    if list(a.columns) != list(b.columns):
        bad.append((name, f"schema: spark={list(a.columns)} duck={list(b.columns)}")); continue
    a = a.sort_values(by=list(a.columns)).reset_index(drop=True)
    b = b.sort_values(by=list(b.columns)).reset_index(drop=True)
    if len(a) != len(b):
        bad.append((name, f"rows: spark={len(a)} duck={len(b)}")); continue
    try:
        import pandas as pd
        # normalize dtypes for compare
        for c in a.columns:
            if a[c].dtype != b[c].dtype:
                try:
                    a[c] = a[c].astype("float64"); b[c] = b[c].astype("float64")
                except Exception:
                    a[c] = a[c].astype(str); b[c] = b[c].astype(str)
        eq = a.equals(b)
        if not eq:
            diff = (a != b) & ~(a.isna() & b.isna())
            nd = int(diff.values.sum())
            # show first mismatching rows
            idx = diff.any(axis=1)
            sample = pd.concat([a[idx].head(3).add_suffix("_spark"),
                                b[idx].head(3).add_suffix("_duck")], axis=1)
            bad.append((name, f"{nd} cell mismatches\n{sample.to_string()}"))
        else:
            ok.append((name, len(a)))
    except Exception as e:
        bad.append((name, f"compare: {e}"))

for name, n in ok:
    print(f"OK   {name:28s} rows={n}")
for name, msg in bad:
    print(f"FAIL {name:28s} {msg}")
print(f"\n{len(ok)} ok, {len(bad)} fail")
sys.exit(1 if bad else 0)
