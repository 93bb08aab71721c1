#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool, not library code).

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB with views
over the sfDir parquet tables, and compares: schema (column names), row
count, and exact values after sorting columns by name and rows by all
columns (the strictest interpretation of the driver's hash compare —
if this passes, any sane hash matches).
"""
import json
import sys
import glob
import os

import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no parquet output")
            n_fail += 1
            continue
        got = pq.read_table(files[0]).to_pandas()
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(got)} rows (no oracle)")
            n_rowsonly += 1
            continue
        try:
            want = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        g, w = normalize(got), normalize(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
            n_fail += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            n_fail += 1
            continue
        try:
            # check_dtype=True: the driver hash-compares arrow values, so a
            # DuckDB HUGEINT vs Spark int64 difference must fail here too.
            pd.testing.assert_frame_equal(g, w, check_dtype=True,
                                          check_exact=True)
            # BIT-STRICT pass: value compare treats -0.0 == 0.0, the
            # driver's byte hash does not (the q208 heaps-law miss) —
            # re-compare float columns at the raw-bits level.
            import numpy as np
            bitfail = None
            for c in g.columns:
                if str(g[c].dtype).startswith("float"):
                    gb = g[c].to_numpy()
                    wb = w[c].to_numpy()
                    gm, wm = np.isnan(gb), np.isnan(wb)
                    neq = ~(gm & wm) & ((gm != wm) | (gb != wb) |
                                        (np.signbit(gb) != np.signbit(wb)))
                    if neq.any():
                        i = int(np.argmax(neq))
                        bitfail = (c, gb[i], wb[i],
                                   bool(np.signbit(gb[i])),
                                   bool(np.signbit(wb[i])))
                        break
            if bitfail is not None:
                c, gv, wv, gs, ws = bitfail
                print(f"FAIL {name}: BIT-STRICT mismatch in '{c}': "
                      f"{gv!r} (signbit={gs}) vs {wv!r} (signbit={ws}) — "
                      f"likely a -0.0 sign bit; SURVEY §7.4 convention")
                n_fail += 1
                continue
            print(f"PASS {name}: {len(g)} rows")
            n_pass += 1
        except AssertionError as e:
            print(f"FAIL {name}: value mismatch\n{str(e)[:800]}")
            # show first differing rows for debugging
            neq = (g != w) & ~(g.isna() & w.isna())
            bad = neq.any(axis=1)
            if bad.any():
                i = bad.idxmax()
                print("  got :", g.loc[i].to_dict())
                print("  want:", w.loc[i].to_dict())
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
