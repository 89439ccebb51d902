#!/usr/bin/env python3
"""Build the SCALING.md probe corpus: documents x64 (unique ids, replica-
tagged text -> every doc gains 63 true near-duplicates) and embeddings
x16 (per-replica pseudo-random sign flips -> replicas decorrelated),
plus symlinks for the remaining sf0.1 tables. Dev-side only (duckdb is
the driver's tooling, not an engine dependency).

Optional third arg FILES (default 1): write documents/embeddings as a
DIRECTORY of that many hash-spread parquet files instead of one file.
A single ~36 MB file scans as ONE Spark task (row-group artifact), so
the r22 core-scaling table uses FILES=16 to make scans splittable —
same row multiset, only the file layout differs."""
import duckdb
import os
import sys

src = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.1'
out = sys.argv[2] if len(sys.argv) > 2 else '/tmp/graft-sf-big'
files = int(sys.argv[3]) if len(sys.argv) > 3 else 1
os.makedirs(out, exist_ok=True)
con = duckdb.connect()

DOCS = f"""
  SELECT doc_id + 10000000*r AS doc_id, lang, source,
         n_chars, 'r' || r || ' ' || text AS text
  FROM read_parquet('{src}/documents.parquet'), range(0, 64) t(r)
"""
EMB = f"""
  SELECT vec_id + 10000000*r AS vec_id, label,
    list_transform(range(1, len(embedding)+1),
      i -> embedding[i] * (CASE WHEN hash(r*1000+i) % 2 = 0
                           THEN 1.0 ELSE -1.0 END)::FLOAT) AS embedding
  FROM read_parquet('{src}/embeddings.parquet'), range(0, 16) t(r)
"""

def copy(query, dest, key, nfiles):
    if nfiles <= 1:
        con.sql(f"COPY ({query}) TO '{dest}' (FORMAT PARQUET)")
    else:
        os.makedirs(dest, exist_ok=True)
        for p in range(nfiles):
            con.sql(f"COPY (SELECT * FROM ({query}) WHERE hash({key}) % "
                    f"{nfiles} = {p}) TO '{dest}/part-{p:04d}.parquet' "
                    "(FORMAT PARQUET)")

copy(DOCS, f'{out}/documents.parquet', 'doc_id', files)
copy(EMB, f'{out}/embeddings.parquet', 'vec_id', max(1, files // 2))
for t in ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
          'lineitem', 'events']:
    dst = f'{out}/{t}.parquet'
    if not os.path.exists(dst):
        os.symlink(f'{src}/{t}.parquet', dst)
glob = f'{out}/documents.parquet' + ('/*.parquet' if files > 1 else '')
print(con.sql(f"SELECT count(*) AS docs FROM read_parquet('{glob}')").fetchall())
