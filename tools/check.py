#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify
output against the DuckDB oracles and diff exactly (schema + values).

Usage: python3 tools/check.py [SF_DIR] [VERIFY_OUT]
(defaults: /root/testdata/sf0.01 /tmp/verify_out)
"""
import glob
import json
import sys

import duckdb
import numpy as np
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
# Names the Verify run actually tried to dump (written since r11): a
# query that is in here but produced no parquet CRASHED and must fail,
# not be skipped. Without the file (older output dirs), every absent
# output is treated as a subset skip, as before.
try:
    attempted = set(json.load(open(f"{OUT}/attempted.json")))
except FileNotFoundError:
    attempted = None
except json.JSONDecodeError as e:
    print(f"WARN: {OUT}/attempted.json unreadable ({e}); treating all "
          "absent outputs as subset skips")
    attempted = None


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


# Measured-fence skips (Verify's census decided a quadratic-by-
# definition row crosses its candidate gate at this SF): absent
# outputs for these names are documented skips with the census in the
# reason, never crashes. Older output dirs have no fenced.json.
try:
    fenced = json.load(open(f"{OUT}/fenced.json"))
except (FileNotFoundError, json.JSONDecodeError):
    fenced = {}

ok, bad, absent, stale = [], [], [], []
for name in sorted(oracle):
    files = sorted(glob.glob(f"{OUT}/{name}/*.parquet"))
    # The inverse gate: an output that EXISTS but is not in this run's
    # attempted list is a leftover from a previous run into the same
    # out dir — comparing it would red/green a row this run never
    # produced. Skip it loudly instead.
    if files and attempted is not None and name not in attempted:
        stale.append(name)
        continue
    if not files:
        # oracle_sql.json always carries the FULL catalog; a subset
        # Verify run only dumps some outputs. Absent outputs are
        # skipped (loudly, below) ONLY when the attempted list proves
        # the run never tried them — an attempted name with no output
        # means Verify swallowed that query's exception, which is a
        # hard failure, not a skip.
        if name in fenced:
            print(f"  skip {name}: {fenced[name]}")
            absent.append(name)
        elif attempted is not None and name in attempted:
            bad.append((name, "NO SPARK OUTPUT (attempted but crashed)"))
        else:
            absent.append(name)
        continue
    try:
        got = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
        want = con.sql(oracle[name]).df()
    except Exception as e:
        bad.append((name, f"SQL ERROR: {str(e)[:200]}"))
        continue
    g, w = norm(got), norm(want)
    if list(g.columns) != list(w.columns):
        bad.append((name, f"COLUMNS spark={list(g.columns)} oracle={list(w.columns)}"))
        continue
    if [str(t) for t in g.dtypes] != [str(t) for t in w.dtypes]:
        bad.append((name, f"DTYPES spark={dict(zip(g.columns, map(str, g.dtypes)))} "
                          f"oracle={dict(zip(w.columns, map(str, w.dtypes)))}"))
        continue
    if len(g) != len(w):
        bad.append((name, f"ROWS spark={len(g)} oracle={len(w)}"))
        continue
    if g.equals(w):
        ok.append(name)
        continue
    # locate first mismatching cell for diagnostics
    detail = "VALUES differ"
    for c in g.columns:
        a, b = g[c], w[c]
        if a.dtype.kind == "f":
            eq = (a.isna() & b.isna()) | np.isclose(a, b, rtol=0, atol=0, equal_nan=True)
            close = (a.isna() & b.isna()) | np.isclose(a, b, rtol=1e-9, equal_nan=True)
            if not eq.all():
                i = int(np.argmin(eq.values))
                tag = "close" if close.all() else "FAR"
                detail = f"col {c} row {i}: spark={a.iloc[i]!r} oracle={b.iloc[i]!r} ({tag})"
                break
        else:
            eq = (a.isna() & b.isna()) | (a == b)
            if not eq.all():
                i = int(np.argmin(eq.values))
                detail = f"col {c} row {i}: spark={a.iloc[i]!r} oracle={b.iloc[i]!r}"
                break
    bad.append((name, detail))

print(f"PASS {len(ok)}/{len(oracle) - len(absent) - len(stale)}"
      + (f" (skipped {len(absent)} without dumped outputs — subset run)"
         if absent else ""))
if stale:
    print(f"WARN: {len(stale)} STALE outputs present but not in this "
          f"run's attempted list (previous run's leftovers, NOT checked): "
          + ", ".join(stale))
for n in ok:
    print(f"  ok   {n}")
for n, why in bad:
    print(f"  FAIL {n}: {why}")
sys.exit(1 if bad else 0)
