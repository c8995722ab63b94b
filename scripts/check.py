#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 scripts/check.py <verify_out_dir> [sf_dir]

Expects `graft.Verify` to have been run first:
  sbt "runMain graft.Verify /root/testdata/sf0.01 <verify_out_dir>"

For every query with oracle SQL: run the SQL in DuckDB over views of the
testdata tables, read the Spark parquet result, sort columns by name and
rows by all values, and compare exactly. Reports per-query PASS/FAIL and
a float-tolerance diagnosis on mismatch. Queries without oracle SQL get
a rows>0 check. This script is validation tooling only — it is not part
of the library.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def bit_exact(s: pd.DataFrame, o: pd.DataFrame) -> bool:
    """Faithful proxy for the driver's bit-level hash: float columns are
    compared as raw bit patterns AT THEIR OWN WIDTH (float64 via uint64
    views, float32 via uint32 views), so -0.0 != +0.0 and NaN payloads
    must match exactly (pandas .equals treats -0.0 == +0.0, which hid
    the vs05 sign-bit mismatch for a round — r5 verdict). A float dtype
    MISMATCH between the two frames fails outright: widening one side
    to float64 first would let a float32-vs-float64 schema drift compare
    equal here while the driver's raw-byte hash fails it (r6 ADVICE)."""
    import numpy as np
    for c in s.columns:
        a, b = s[c], o[c]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            if a.dtype != b.dtype:
                print(f"    dtype mismatch on `{c}`: spark={a.dtype} oracle={b.dtype}")
                return False
            uview = np.uint32 if a.dtype == np.float32 else np.uint64
            if not np.array_equal(a.to_numpy().view(uview), b.to_numpy().view(uview)):
                return False
        elif not a.equals(b):
            return False
    return True


def main() -> int:
    out_dir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    import glob
    import os

    names = sorted(
        d for d in os.listdir(out_dir) if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = 0
    # a registered query that wrote no output is a FAILURE, not absence
    reg_path = os.path.join(out_dir, "query_names.json")
    if os.path.exists(reg_path):
        with open(reg_path) as f:
            registered = set(json.load(f))
        for missing in sorted(registered - set(names)):
            print(f"FAIL {missing}: query produced no output (crashed in Verify)")
            n_fail += 1
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output files")
            n_fail += 1
            continue
        spark_df = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        if name not in oracles:
            status = "pass (rows-only)" if len(spark_df) > 0 else "FAIL (rows-only, 0 rows)"
            if len(spark_df) > 0:
                n_pass += 1
                print(f"pass {name}: rows-only, {len(spark_df)} rows")
            else:
                n_fail += 1
                print(f"FAIL {name}: rows-only check with 0 rows")
            continue
        try:
            oracle_df = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        s, o = normalize(spark_df), normalize(oracle_df)
        if list(s.columns) != list(o.columns):
            print(f"FAIL {name}: columns spark={list(s.columns)} oracle={list(o.columns)}")
            n_fail += 1
            continue
        if len(s) != len(o):
            print(f"FAIL {name}: rows spark={len(s)} oracle={len(o)}")
            n_fail += 1
            continue
        if bit_exact(s, o):
            print(f"pass {name}: {len(s)} rows bit-exact")
            n_pass += 1
            continue
        # diagnose: bit-exact failed — classify the mismatch
        import numpy as np
        close = True
        sign_only = True
        for c in s.columns:
            a, b = s[c], o[c]
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                af, bf = a.to_numpy(dtype=float), b.to_numpy(dtype=float)
                if not np.allclose(af, bf, rtol=1e-9, atol=1e-12, equal_nan=True):
                    close = False
                    sign_only = False
                    break
                # values equal under tolerance: is the residual only ±0.0?
                bits_ne = af.view(np.uint64) != bf.view(np.uint64)
                if np.any(bits_ne & ~((af == 0.0) & (bf == 0.0))):
                    sign_only = False
            elif not a.equals(b):
                close = False
                sign_only = False
                break
        if close and sign_only:
            print(f"FAIL {name}: -0.0/+0.0 sign-bit mismatch ({len(s)} rows) — normalize with + 0.0")
        elif close:
            print(f"FAIL {name}: float-bits-only mismatch ({len(s)} rows) — tighten rounding")
        else:
            print(f"FAIL {name}: value mismatch; first diffs:")
            diff_mask = (s != o).any(axis=1)
            print(pd.concat([s[diff_mask].head(3), o[diff_mask].head(3)], keys=["spark", "oracle"]))
        n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail / {len(names)} queries")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
