#!/usr/bin/env python3
"""Determinism soak (dev tool, not library code): compare two independent
graft.Verify output dirs per query — results must be value-identical
after canonical row ordering, regardless of partition layout or CPU
count the two runs used.

Usage: python3 tools/determinism_soak.py <outDirA> <outDirB>

Run e.g.:
  SPARK_GRAFT_CPUS=4  sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/soakA"
  SPARK_GRAFT_CPUS=32 sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/soakB"
  python3 tools/determinism_soak.py /tmp/soakA /tmp/soakB

Rows are sorted by all columns before comparing (a query's presentation
order is part of its contract, but parquet part-file concatenation
order is not); values must then match EXACTLY — bit-for-bit doubles.
"""
import glob
import os
import sys

import pandas as pd
import pyarrow.parquet as pq


def load(out_dir: str, name: str) -> pd.DataFrame:
    files = sorted(glob.glob(os.path.join(out_dir, name, "*.parquet")))
    df = pd.concat([pq.read_table(f).to_pandas() for f in files],
                   ignore_index=True)
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def main(a_dir: str, b_dir: str) -> int:
    names = sorted(
        os.path.basename(p) for p in glob.glob(os.path.join(a_dir, "q*"))
        if os.path.isdir(p))
    missing = [n for n in names
               if not os.path.isdir(os.path.join(b_dir, n))]
    if missing:
        print(f"MISSING in {b_dir}: {missing}")
        return 1
    bad = 0
    for n in names:
        a, b = load(a_dir, n), load(b_dir, n)
        try:
            pd.testing.assert_frame_equal(a, b, check_exact=True)
            print(f"PASS {n}: {len(a)} rows identical")
        except AssertionError as e:
            bad += 1
            print(f"FAIL {n}: {str(e).splitlines()[0]}")
    print(f"\n{len(names) - bad} identical, {bad} differ")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
