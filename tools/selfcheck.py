#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/selfcheck.py [sfdir] [outdir]

Assumes `sbt "runMain graft.Verify <sfdir> <outdir>"` has already produced
<outdir>/<query>/ parquet dirs and <outdir>/oracle_sql.json. Runs each oracle
SQL in DuckDB over the same parquet tables and compares pandas-side, like the
driver does — and deliberately at least as strict:

- dtype-sensitive: both sides materialize as pandas DataFrames and the dtype
  lists must match exactly. This catches the HUGEINT trap (uncast DuckDB
  sum() -> int128 -> pandas float64 "35.0" vs Spark int64 "35") that 6dp
  value formatting used to mask.
- scalar-only: any list/array/dict-valued output column is an immediate FAIL
  (the driver's pandas sort_values crashes on them -> gate `err`).
- full-precision floats: values render via repr(float), not a 6dp format, so
  a single-ulp drift between engines fails here before it fails the gate.
"""
import json
import math
import sys

import duckdb
import numpy as np

SFDIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
ONLY = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SFDIR}/{t}.parquet'")

with open(f"{OUT}/oracle_sql.json") as f:
    oracles = json.load(f)


def render(v):
    if v is None:
        return "None"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        return "NaN" if math.isnan(f) else repr(f)
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    return str(v)


def frame(df):
    """-> (col names, dtypes, rendered+sorted rows); raises on non-scalar."""
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object and df[c].map(
                lambda v: isinstance(v, (list, tuple, dict, np.ndarray))).any():
            raise ValueError(f"non-scalar (list/array) column '{c}' — the "
                             "driver's sort_values crashes on these")
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort",
                            na_position="last").reset_index(drop=True)
    # dtype KIND, not width: int32 vs int64 render identically ("35") so the
    # driver hashes them the same; int64 vs float64 ("35" vs "35.0") does not.
    dtypes = [df[c].dtype.kind for c in df.columns]
    rows = [tuple(render(v) for v in row)
            for row in df.itertuples(index=False, name=None)]
    return list(df.columns), dtypes, rows


ok = fail = 0
for name, sql in sorted(oracles.items()):
    if ONLY and name not in ONLY:
        continue
    try:
        got_names, got_dt, got = frame(
            con.sql(f"SELECT * FROM '{OUT}/{name}/*.parquet'").df())
    except Exception as e:
        print(f"FAIL {name}: spark-side error {e}")
        fail += 1
        continue
    try:
        want_names, want_dt, want = frame(con.sql(sql).df())
    except Exception as e:
        print(f"FAIL {name}: oracle-side error {e}")
        fail += 1
        continue
    if got_names != want_names:
        print(f"FAIL {name}: columns {got_names} != {want_names}")
        fail += 1
        continue
    if got_dt != want_dt:
        print(f"FAIL {name}: dtypes spark={got_dt} oracle={want_dt}")
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
        for i, (a, b) in enumerate(zip(got, want)):
            if a != b:
                print(f"  first diff at row {i}: spark={a} oracle={b}")
                break

print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
