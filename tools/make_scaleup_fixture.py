#!/usr/bin/env python3
"""Build the 10x scale-up fixture (SCALE.md's empirical section).

Replicates sf0.1 N times with per-replica perturbation so replicas are
NEAR-duplicates (the adversarial case for LSH/SemDeDup — dup-dense, not
degenerate identical rows):
  documents:  doc_id offset, one replica-tagged token appended
  embeddings: vec_id offset, +r*1e-3 coordinate shift
  events:     event_id/user_id offsets (10x the key cardinality)
  TPC-H tables: copied unchanged (only used for session warmup here)

Usage: python3 tools/make_scaleup_fixture.py [N] [src] [dst]
Defaults: 10 /root/testdata/sf0.1 /tmp/sf1
"""
import sys

import duckdb

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10
SRC = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
DST = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sf1"

import os

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
reps = f"(SELECT unnest(range({N})) AS r)"

con.execute(f"""
COPY (
  SELECT doc_id + r * 1000000 AS doc_id,
         CASE WHEN r = 0 THEN text ELSE text || ' rep' || r END AS text,
         lang, source, n_chars
  FROM read_parquet('{SRC}/documents.parquet'), {reps}
) TO '{DST}/documents.parquet' (FORMAT PARQUET)""")

con.execute(f"""
COPY (
  SELECT vec_id + r * 1000000 AS vec_id,
         list_transform(embedding, x -> x + r * 0.001)::FLOAT[] AS embedding,
         label
  FROM read_parquet('{SRC}/embeddings.parquet'), {reps}
) TO '{DST}/embeddings.parquet' (FORMAT PARQUET)""")

con.execute(f"""
COPY (
  SELECT event_id + r * 100000000 AS event_id, ts,
         user_id + r * 1000000 AS user_id, event_type,
         value + r * 0.01 AS value, props
  FROM read_parquet('{SRC}/events.parquet'), {reps}
) TO '{DST}/events.parquet' (FORMAT PARQUET)""")

for t in "region nation customer supplier part orders lineitem".split():
    con.execute(f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
                f"TO '{DST}/{t}.parquet' (FORMAT PARQUET)")

for t in ("documents", "embeddings", "events"):
    n = con.execute(f"SELECT count(*) FROM read_parquet('{DST}/{t}.parquet')").fetchone()[0]
    print(t, n)
