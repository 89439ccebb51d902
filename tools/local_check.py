#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: read each Spark query dump
(outDir/<name>/*.parquet), run the matching oracle SQL in DuckDB over the
same fixture tables, sort columns by name, and compare values exactly
(bit-exact for floats — the queries are designed for that)."""
import duckdb, sys, json, glob, os
import pyarrow.parquet as pq
import pandas as pd
import numpy as np

sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.001'
out = sys.argv[2] if len(sys.argv) > 2 else '/tmp/graft_out'

con = duckdb.connect()
for t in ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
          'lineitem', 'events', 'documents', 'embeddings']:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

# Full runs write oracle_sql.json; SPARK_GRAFT_ONLY-filtered runs write
# oracle_sql_filtered.json so a full comparison can never silently
# validate a subset. Prefer the full map; fall back to the filtered one
# (announcing it) for local iteration.
if os.path.exists(f'{out}/oracle_sql.json'):
    oracle = json.load(open(f'{out}/oracle_sql.json'))
else:
    oracle = json.load(open(f'{out}/oracle_sql_filtered.json'))
    print(f'NOTE: filtered oracle map ({len(oracle)} queries) — '
          'not a full-run validation')
fails = 0
for name, sql in sorted(oracle.items()):
    try:
        files = sorted(glob.glob(f'{out}/{name}/*.parquet'))
        sdf = pd.concat([pq.read_table(f).to_pandas() for f in files],
                        ignore_index=True)
    except Exception as e:
        print(f'{name}: SPARK-READ-FAIL {e}'); fails += 1; continue
    try:
        odf = con.sql(sql).df()
    except Exception as e:
        print(f'{name}: ORACLE-FAIL {type(e).__name__}: {e}'); fails += 1; continue
    s = sdf[sorted(sdf.columns)]
    o = odf[sorted(odf.columns)]
    issues = []
    if list(s.columns) != list(o.columns):
        issues.append(f'cols {list(s.columns)} vs {list(o.columns)}')
    elif len(s) != len(o):
        issues.append(f'rows {len(s)} vs {len(o)}')
    else:
        for c in s.columns:
            a, b = pd.Series(s[c].values), pd.Series(o[c].values)
            try:
                eq = (a == b) | (a.isna() & b.isna())
            except Exception as e:
                issues.append(f'col {c}: compare error {e} dtypes {a.dtype}/{b.dtype}')
                continue
            if not eq.all():
                i = int(np.argmax(~eq.values))
                issues.append(f'col {c}: {int((~eq).sum())} diffs, first at row {i}: '
                              f'{a.iloc[i]!r} vs {b.iloc[i]!r}')
        for c in s.columns:
            if str(s[c].dtype) != str(o[c].dtype):
                issues.append(f'col {c}: dtype {s[c].dtype} vs {o[c].dtype}')
    if issues:
        print(f'{name}: FAIL ' + ' | '.join(issues)); fails += 1
    else:
        print(f'{name}: OK rows={len(s)}')
print(f'--- {len(oracle) - fails}/{len(oracle)} OK')
sys.exit(1 if fails else 0)
