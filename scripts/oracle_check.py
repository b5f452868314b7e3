#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 scripts/oracle_check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching SQL from <verifyOutDir>/oracle_sql.json in DuckDB against views named
after the testdata tables, and compares: column names, row count, and values
(rows and columns sorted by name, exact match after the in-query rounding).
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    # exact repr compare — the whole surface is bit-identical to DuckDB
    # (in-query DECIMAL aggregation + rounding discipline), so no epsilon
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float) and math.isnan(v):
                v = "NaN"
            vals.append(repr(v))
        out.append(tuple(vals))
    out.sort()
    return out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    # big-rung robustness: let DuckDB spill to disk instead of dying on a
    # hard OOM when an oracle's intermediate state exceeds RAM (first hit:
    # the composed as-of join's pair stream at the sf100 rung's 10M
    # events). Insertion order is irrelevant here — rows are sorted before
    # comparison — and dropping it shrinks blocking-operator memory.
    os.makedirs(f"{out_dir}/duck_tmp", exist_ok=True)
    con.execute(f"SET temp_directory='{out_dir}/duck_tmp'")
    con.execute("SET preserve_insertion_order=false")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    failures = 0
    for name, sql in sorted(oracles.items()):
        try:
            spark_rel = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            spark_cols = [d[0] for d in spark_rel.description]
            spark_desc = list(spark_rel.description)
            spark_rows = spark_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: cannot read spark result: {e}")
            failures += 1
            continue
        try:
            duck_rel = con.execute(sql)
            duck_cols = [d[0] for d in duck_rel.description]
            duck_desc = list(duck_rel.description)
            duck_rows = duck_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        if sorted(spark_cols) != sorted(duck_cols):
            print(f"FAIL {name}: columns spark={sorted(spark_cols)} "
                  f"duck={sorted(duck_cols)}")
            failures += 1
            continue
        if len(spark_rows) != len(duck_rows):
            print(f"FAIL {name}: rows spark={len(spark_rows)} "
                  f"duck={len(duck_rows)}")
            failures += 1
            continue
        # driver-parity guard: the driver hashes through arrow/pandas,
        # where a DuckDB HUGEINT (any uncast sum() of integers) or
        # DECIMAL result column reprs differently from Spark's BIGINT/
        # DOUBLE even when every value is equal — rows+schema match but
        # the hash flips (round-14 q115/q118). Compare declared types.
        sp_ty = {d[0]: str(d[1]) for d in spark_desc}
        du_ty = {d[0]: str(d[1]) for d in duck_desc}
        ty_mismatch = [(c, sp_ty[c], du_ty[c]) for c in sorted(sp_ty)
                       if c in du_ty and sp_ty[c] != du_ty[c]]
        if ty_mismatch:
            print(f"FAIL {name}: result-type mismatch (driver hash would "
                  f"flip): {ty_mismatch}")
            failures += 1
            continue
        a, b = canon(spark_rows, spark_cols), canon(duck_rows, duck_cols)
        if a != b:
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {diff}")
            failures += 1
            continue
        print(f"PASS {name} ({len(spark_rows)} rows)")
    print(f"{'ALL PASS' if failures == 0 else f'{failures} FAILURES'} "
          f"({len(oracles)} oracle queries)")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
