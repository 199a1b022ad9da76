#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/selfcheck.py [sfdir] [outdir]

Assumes `sbt "runMain graft.Verify <sfdir> <outdir>"` has already produced
<outdir>/<query>/ parquet dirs and <outdir>/oracle_sql.json. Runs each oracle
SQL in DuckDB over the same parquet tables and compares values column-sorted
and row-sorted, like the driver does.
"""
import json
import math
import sys

import duckdb

SFDIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SFDIR}/{t}.parquet'")

with open(f"{OUT}/oracle_sql.json") as f:
    oracles = json.load(f)


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6f}"
    return str(v)


def frame(rel):
    cols = sorted(range(len(rel.columns)), key=lambda i: rel.columns[i])
    names = [rel.columns[i] for i in cols]
    rows = sorted(tuple(norm(r[i]) for i in cols) for r in rel.fetchall())
    return names, rows


ok = fail = 0
for name, sql in sorted(oracles.items()):
    try:
        got_names, got = frame(con.sql(f"SELECT * FROM '{OUT}/{name}/*.parquet'"))
        want_names, want = frame(con.sql(sql))
    except Exception as e:
        print(f"FAIL {name}: error {e}")
        fail += 1
        continue
    if got_names != want_names:
        print(f"FAIL {name}: columns {got_names} != {want_names}")
        fail += 1
        continue
    if got == want:
        print(f"ok   {name} ({len(got)} rows)")
        ok += 1
    else:
        fail += 1
        print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
        sg, sw = set(got), set(want)
        only_g = list(sg - sw)[:3]
        only_w = list(sw - sg)[:3]
        if only_g:
            print(f"  spark-only: {only_g}")
        if only_w:
            print(f"  oracle-only: {only_w}")
        # also show ordering-sensitive first diff
        for i, (a, b) in enumerate(zip(got, want)):
            if a != b:
                print(f"  first diff at row {i}: spark={a} oracle={b}")
                break

print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
