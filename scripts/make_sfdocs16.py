#!/usr/bin/env python3
"""Build the docs-heavy "16x" dedup-stress fixture from sf0.1
(SCALING.md's third rung, reproducibly): documents & embeddings x16
with key offsets, dims AND facts copied as-is. Replication multiplies
every duplicate group by 16 (a doc + its near-dup mutant become a
32-member group), so pair-output near-dup queries (q31/q32/q33), the
span/line dedup family (q74/q91), SemDeDup (q77) and the ANN builds
(q34-q39) all run against the skew/cardinality regime the scale claims
were validated on.

Usage: python3 scripts/make_sfdocs16.py [srcDir] [dstDir]
Defaults: /root/testdata/sf0.1 -> /tmp/sfdocs16
"""
import os
import sys

import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfdocs16"
os.makedirs(dst, exist_ok=True)

con = duckdb.connect()

COPY_AS_IS = ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events"]
for t in COPY_AS_IS:
    con.sql(f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)")

# documents/embeddings x16: surrogate keys offset per copy (max+1 so
# copies never collide regardless of key density); text/embedding
# payloads repeat verbatim — the duplicate explosion is the point.
dkey_off = con.sql(
    f"SELECT max(doc_id)+1 FROM read_parquet('{src}/documents.parquet')").fetchone()[0]
con.sql(f"""COPY (
  SELECT doc_id + i * {dkey_off} AS doc_id, text, lang, source, n_chars
  FROM read_parquet('{src}/documents.parquet'), generate_series(0, 15) AS g(i)
) TO '{dst}/documents.parquet' (FORMAT PARQUET)""")
vkey_off = con.sql(
    f"SELECT max(vec_id)+1 FROM read_parquet('{src}/embeddings.parquet')").fetchone()[0]
con.sql(f"""COPY (
  SELECT vec_id + i * {vkey_off} AS vec_id, embedding, label
  FROM read_parquet('{src}/embeddings.parquet'), generate_series(0, 15) AS g(i)
) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)""")

for t in COPY_AS_IS + ["documents", "embeddings"]:
    n = con.sql(f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')").fetchone()[0]
    print(f"{t}: {n}")
print(f"16x-docs fixture at {dst}")
