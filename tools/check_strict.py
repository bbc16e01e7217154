#!/usr/bin/env python3
"""Strict replica of the driver's correctness hash gate.

Unlike check.py (which allows float tolerance), this compares the
Spark parquet output and the DuckDB oracle result EXACTLY the way the
driver's hash does: sort columns by name, sort rows, then require
identical dtypes-at-value-level (int64 500 != float64 500.0) and
bit-identical values. Usage:

    python3 tools/check_strict.py <sfDir> <verifyOutDir> [query ...]
"""
import json
import sys
import glob
import os

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def cell_repr(v):
    # the value-level identity the driver's hash sees
    if isinstance(v, float) and v.is_integer() and abs(v) < 2**53:
        return repr(v)  # keep 500.0 distinct from 500
    return repr(v)


def main(sf_dir, out_dir, only):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name in sorted(oracles):
        if only and name not in only:
            continue
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            s = norm(pd.concat([pd.read_parquet(f) for f in files]))
            d = norm(con.execute(oracles[name]).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: columns {list(s.columns)} vs {list(d.columns)}")
            n_fail += 1
            continue
        if len(s) != len(d):
            print(f"FAIL {name}: rows {len(s)} vs {len(d)}")
            n_fail += 1
            continue
        bad = None
        for c in s.columns:
            for i in range(len(s)):
                a, b = s[c].iloc[i], d[c].iloc[i]
                if cell_repr(a) != cell_repr(b):
                    bad = (c, i, a, b)
                    break
            if bad:
                break
        if bad:
            c, i, a, b = bad
            print(f"FAIL {name}: col {c} row {i}: {a!r} ({type(a).__name__}) "
                  f"vs {b!r} ({type(b).__name__})")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s)} rows, exact)")
            n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail (strict)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:])))
