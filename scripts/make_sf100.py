#!/usr/bin/env python3
"""Build the ~100x "sf100facts" scale-ladder replica from sf0.1
(SCALING.md's top rung, reproducibly): facts x100 with key offsets
(lineitem 60M rows, orders 15M, events 10M), documents/embeddings x40
(200k docs / 80k vectors), dims copied as-is. Replication multiplies
duplicate groups x40 (a doc + its near-dup mutant become an 80-member
group), deliberately stress-testing the dedup/LSH/ANN family at the
cardinality regime the 100-TB design claims target.

Usage: python3 scripts/make_sf100.py [srcDir] [dstDir]
Defaults: /root/testdata/sf0.1 -> /tmp/sf100
"""
import os
import sys

import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf100"
os.makedirs(dst, exist_ok=True)

con = duckdb.connect()

DIMS = ["region", "nation", "customer", "supplier", "part"]
for t in DIMS:
    con.sql(f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)")

# facts x100: surrogate keys offset per copy so uniqueness holds and the
# lineitem->orders FK stays consistent; everything else repeats verbatim
# (duplicate groups are the point). Offsets use max+1 so copies never
# collide regardless of key density.
okey_off = con.sql(
    f"SELECT max(o_orderkey)+1 FROM read_parquet('{src}/orders.parquet')").fetchone()[0]
con.sql(f"""COPY (
  SELECT o_orderkey + i * {okey_off} AS o_orderkey,
         o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM read_parquet('{src}/orders.parquet'), generate_series(0, 99) AS g(i)
) TO '{dst}/orders.parquet' (FORMAT PARQUET)""")
con.sql(f"""COPY (
  SELECT l_orderkey + i * {okey_off} AS l_orderkey,
         l_partkey, l_suppkey, l_linenumber, l_quantity, l_extendedprice,
         l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
  FROM read_parquet('{src}/lineitem.parquet'), generate_series(0, 99) AS g(i)
) TO '{dst}/lineitem.parquet' (FORMAT PARQUET)""")

ekey_off = con.sql(
    f"SELECT max(event_id)+1 FROM read_parquet('{src}/events.parquet')").fetchone()[0]
con.sql(f"""COPY (
  SELECT event_id + i * {ekey_off} AS event_id, ts, user_id, event_type, value, props
  FROM read_parquet('{src}/events.parquet'), generate_series(0, 99) AS g(i)
) TO '{dst}/events.parquet' (FORMAT PARQUET)""")

# docs/embeddings x40 (200k docs / 80k vectors)
dkey_off = con.sql(
    f"SELECT max(doc_id)+1 FROM read_parquet('{src}/documents.parquet')").fetchone()[0]
con.sql(f"""COPY (
  SELECT doc_id + i * {dkey_off} AS doc_id, text, lang, source, n_chars
  FROM read_parquet('{src}/documents.parquet'), generate_series(0, 39) AS g(i)
) TO '{dst}/documents.parquet' (FORMAT PARQUET)""")
vkey_off = con.sql(
    f"SELECT max(vec_id)+1 FROM read_parquet('{src}/embeddings.parquet')").fetchone()[0]
con.sql(f"""COPY (
  SELECT vec_id + i * {vkey_off} AS vec_id, embedding, label
  FROM read_parquet('{src}/embeddings.parquet'), generate_series(0, 39) AS g(i)
) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)""")

for t in DIMS + ["orders", "lineitem", "events", "documents", "embeddings"]:
    n = con.sql(f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')").fetchone()[0]
    print(f"{t}: {n}")
print(f"sf100 replica at {dst}")
