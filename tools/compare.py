#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query dir under outDir,
read the Spark parquet result and run the oracle SQL in DuckDB over the same sf tables,
then compare rows/schema/values (columns sorted by name, rows sorted)."""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

sfdir, outdir = sys.argv[1], sys.argv[2]
oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    # GenScale-derived dirs write each table as a DIRECTORY of part files
    src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")

results = {}
# a query that crashed or timed out in Verify writes NO output dir — report it as FAIL
# instead of silently dropping it from the denominator
present = {os.path.basename(d) for d in glob.glob(os.path.join(outdir, "*")) if os.path.isdir(d)}
for name in sorted(set(oracle) - present):
    results[name] = "MISSING-OUTPUT (query failed or timed out in Verify)"
for qdir in sorted(glob.glob(os.path.join(outdir, "*"))):
    name = os.path.basename(qdir)
    if not os.path.isdir(qdir):
        continue
    try:
        spark_df = pd.read_parquet(qdir)
    except Exception as e:
        results[name] = f"SPARK-READ-FAIL {e}"
        continue
    if name not in oracle:
        results[name] = f"rows-only rows={len(spark_df)}" + (" EMPTY!" if len(spark_df)==0 else "")
        continue
    try:
        duck_df = con.execute(oracle[name]).df()
    except Exception as e:
        results[name] = f"ORACLE-FAIL {str(e)[:200]}"
        continue
    a, b = spark_df.reindex(sorted(spark_df.columns), axis=1), duck_df.reindex(sorted(duck_df.columns), axis=1)
    if list(a.columns) != list(b.columns):
        results[name] = f"SCHEMA-MISMATCH spark={list(a.columns)} duck={list(b.columns)}"
        continue
    if len(a) != len(b):
        results[name] = f"ROWS-MISMATCH spark={len(a)} duck={len(b)}"
        continue
    a = a.sort_values(list(a.columns)).reset_index(drop=True)
    b = b.sort_values(list(b.columns)).reset_index(drop=True)
    bad = []
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == 'f' or bv.dtype.kind == 'f':
            eq = np.allclose(av.astype(float), bv.astype(float), rtol=0, atol=0, equal_nan=True)
            exact = eq
        else:
            try:
                exact = (av.astype(str) == bv.astype(str)).all()
            except Exception:
                exact = False
        if not exact:
            bad.append(c)
    if bad:
        ex = []
        for c in bad[:2]:
            m = (a[c].astype(str) != b[c].astype(str))
            i = m.idxmax()
            ex.append(f"{c}[{i}]: spark={a[c][i]!r} duck={b[c][i]!r}")
        results[name] = "VALUE-MISMATCH " + "; ".join(ex)
    else:
        results[name] = f"OK rows={len(a)}"

npass = sum(1 for v in results.values() if v.startswith("OK") or v.startswith("rows-only"))
for k, v in sorted(results.items()):
    print(f"{'PASS' if v.startswith('OK') or v.startswith('rows-only') else 'FAIL'} {k}: {v}")
print(f"\n{npass}/{len(results)} pass")
