#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py [sf_dir] [verify_out]
Loads each Spark result parquet from verify_out, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the sf_dir tables, and
compares row counts, column names, and (column-name-sorted) values.
"""
import json
import sys

import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

con = duckdb.connect()
# in-memory connections have NO default spill path — without a
# temp_directory the heavy sf0.1 oracles (dedup_eval's PPJoin truth,
# the unrolled knn descents) abort with OOM instead of spilling;
# the cap keeps a concurrent Spark JVM from starving the host.
# Default the cap to half of host RAM (capped at 80 GB) so a smaller
# box doesn't over-commit alongside the Spark JVM; override with
# GRAFT_DUCKDB_MEM. Spill is anchored under the verify-out dir, not
# whatever cwd the script happens to be invoked from.
import os
mem = os.environ.get("GRAFT_DUCKDB_MEM")
if not mem:
    try:
        # SC_PHYS_PAGES is Linux-only; macOS raises ValueError here
        page_bytes = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
        mem = f"{min(80, max(4, page_bytes // (2 * 1024**3)))}GB"
    except (ValueError, OSError, AttributeError):
        mem = "80GB"  # the pre-probe fixed default
con.execute(f"SET temp_directory='{os.path.join(OUT, '.duckdb_tmp')}'")
con.execute(f"SET memory_limit='{mem}'")
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    try:
        spark_df = pd.read_parquet(f"{OUT}/{name}")
        duck_df = con.execute(sql).fetchdf()
    except Exception as e:
        fails.append(name)
        print(f"FAIL {name}: load/exec error: {e}")
        continue
    s = spark_df.reindex(sorted(spark_df.columns), axis=1)
    d = duck_df.reindex(sorted(duck_df.columns), axis=1)
    if list(s.columns) != list(d.columns):
        fails.append(name)
        print(f"FAIL {name}: columns spark={list(s.columns)} duck={list(d.columns)}")
        continue
    if len(s) != len(d):
        fails.append(name)
        print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}")
        continue
    # driver's hash compare is dtype-sensitive (int64 "1" != float64 "1.0"):
    # DuckDB sum(int)->HUGEINT surfaces as float64 — flag kind mismatches hard
    kind_mism = [(c, s[c].dtype.kind, d[c].dtype.kind) for c in s.columns
                 if s[c].dtype.kind != d[c].dtype.kind
                 and s[c].dtype.kind in "fiu" and d[c].dtype.kind in "fiu"
                 and "f" in (s[c].dtype.kind, d[c].dtype.kind)]
    if kind_mism:
        fails.append(name)
        print(f"FAIL {name}: int/float dtype mismatch (spark_kind, duck_kind): {kind_mism}")
        continue
    # order-insensitive compare: sort by all columns
    key = list(s.columns)
    ss = s.sort_values(key).reset_index(drop=True)
    dd = d.sort_values(key).reset_index(drop=True)
    same = True
    for c in key:
        a, b = ss[c], dd[c]
        try:
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                import numpy as np
                eq = np.allclose(a.astype(float), b.astype(float), rtol=0, atol=1e-9, equal_nan=True)
            else:
                eq = a.astype(str).equals(b.astype(str))
        except Exception:
            eq = a.astype(str).equals(b.astype(str))
        if not eq:
            same = False
            mism = (a.astype(str) != b.astype(str))
            idx = mism[mism].index[:3]
            print(f"FAIL {name}: col {c} differs, e.g. rows {list(idx)}: spark={list(a[idx])} duck={list(b[idx])}")
            break
    if same:
        print(f"ok   {name} ({len(s)} rows)")
    else:
        fails.append(name)

# rows-only queries (no oracle): check rows > 0
import glob, os
for p in sorted(glob.glob(f"{OUT}/*")):
    name = os.path.basename(p)
    if name in oracle or name == "oracle_sql.json":
        continue
    try:
        n = len(pd.read_parquet(p))
        print(f"rows {name}: {n}" + ("" if n > 0 else "  <-- EMPTY (FAIL)"))
        if n == 0:
            fails.append(name)
    except Exception as e:
        fails.append(name)
        print(f"FAIL {name}: unreadable: {e}")

print(f"\n{len(fails)} failures" + (f": {fails}" if fails else ""))
sys.exit(1 if fails else 0)
