#!/usr/bin/env python3
"""Spark-vs-Spark determinism sweep: bit-compare two graft.Verify dumps
produced at DIFFERENT partition/worker counts (or any two configs).
Usage: python3 scripts/cross_check.py <dump_a> <dump_b>
Float columns compare as uint64 bit views (same discipline as check.py).
Validation tooling only - not part of the library."""
import duckdb, os, glob, sys
import numpy as np
a_dir, b_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
names = sorted(d for d in os.listdir(a_dir) if os.path.isdir(os.path.join(a_dir, d)))
bad = []
for name in names:
    if not os.path.isdir(os.path.join(b_dir, name)):
        bad.append((name, "missing")); continue
    try:
        a = con.sql(f"SELECT * FROM '{a_dir}/{name}/*.parquet'").df()
        b = con.sql(f"SELECT * FROM '{b_dir}/{name}/*.parquet'").df()
    except Exception as e:
        bad.append((name, f"read {e}")); continue
    def norm(df):
        df = df.reindex(sorted(df.columns), axis=1)
        return df.sort_values(by=list(df.columns), ignore_index=True)
    a, b = norm(a), norm(b)
    if list(a.columns) != list(b.columns) or len(a) != len(b):
        bad.append((name, f"shape {len(a)}x{len(a.columns)} vs {len(b)}x{len(b.columns)}")); continue
    for c in a.columns:
        x, y = a[c], b[c]
        if x.dtype.kind == "f" and y.dtype.kind == "f":
            if not np.array_equal(x.to_numpy(np.float64).view(np.uint64),
                                  y.to_numpy(np.float64).view(np.uint64)):
                bad.append((name, f"col {c} bits")); break
        elif not x.equals(y):
            bad.append((name, f"col {c}")); break
print(f"{len(names)-len(bad)} identical, {len(bad)} differ / {len(names)}")
for n, r in bad: print("DIFF", n, r)
