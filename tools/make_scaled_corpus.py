#!/usr/bin/env python3
"""Build the SCALING.md probe corpus: documents x64 (unique ids, replica-
tagged text -> every doc gains 63 true near-duplicates) and embeddings
x16 (per-replica pseudo-random sign flips -> replicas decorrelated),
plus symlinks for the remaining sf0.1 tables. Dev-side only (duckdb is
the driver's tooling, not an engine dependency)."""
import duckdb
import os
import sys

src = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.1'
out = sys.argv[2] if len(sys.argv) > 2 else '/tmp/graft-sf-big'
os.makedirs(out, exist_ok=True)
con = duckdb.connect()
con.sql(f"""
COPY (
  SELECT doc_id + 10000000*r AS doc_id, lang, source,
         n_chars, 'r' || r || ' ' || text AS text
  FROM read_parquet('{src}/documents.parquet'), range(0, 64) t(r)
) TO '{out}/documents.parquet' (FORMAT PARQUET)
""")
con.sql(f"""
COPY (
  SELECT vec_id + 10000000*r AS vec_id, label,
    list_transform(range(1, len(embedding)+1),
      i -> embedding[i] * (CASE WHEN hash(r*1000+i) % 2 = 0
                           THEN 1.0 ELSE -1.0 END)::FLOAT) AS embedding
  FROM read_parquet('{src}/embeddings.parquet'), range(0, 16) t(r)
) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
""")
for t in ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
          'lineitem', 'events']:
    dst = f'{out}/{t}.parquet'
    if not os.path.exists(dst):
        os.symlink(f'{src}/{t}.parquet', dst)
print(con.sql(f"SELECT count(*) AS docs FROM read_parquet('{out}/documents.parquet')").fetchall())
