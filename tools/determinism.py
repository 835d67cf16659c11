#!/usr/bin/env python3
"""Cross-run determinism check: compare two graft.Verify output dirs.

Usage:
  sbt -batch "runMain graft.Verify <sfDir> /tmp/vr1"
  sbt -batch "runMain graft.Verify <sfDir> /tmp/vr2"
  python3 tools/determinism.py /tmp/vr1 /tmp/vr2

The DuckDB oracle gate (tools/check.py) proves Spark == DuckDB on one
run; this proves Spark == Spark across runs — catching partition-order,
timestamp, or RNG nondeterminism that a single gate run can mask when
it happens to agree with the oracle.
"""
import sys, glob, os
import duckdb

def rows(path):
    df = duckdb.sql(f"SELECT * FROM '{path}/*.parquet'").df()
    cols = sorted(df.columns)
    return sorted(
        tuple(str(round(v, 6)) if isinstance(v, float) else str(v) for v in r)
        for r in df[cols].itertuples(index=False))

def main(d1, d2):
    bad = []
    # union of both roots: a query dir present in only ONE run (e.g. the
    # other run crashed mid-way) is itself a stability failure, not a
    # name to skip
    names = sorted({os.path.basename(d)
                    for root in (d1, d2) for d in glob.glob(f"{root}/*")
                    if os.path.isdir(d)})
    for name in names:
        missing = [d for d in (d1, d2) if not os.path.isdir(f"{d}/{name}")]
        if missing:
            bad.append(f"{name} (missing in {missing[0]})")
            continue
        if rows(f"{d1}/{name}") != rows(f"{d2}/{name}"):
            bad.append(name)
        else:
            print(f"STABLE {name}")
    if bad:
        print(f"== NONDETERMINISTIC: {bad} ==")
        return 1
    print(f"== all {len(names)} queries byte-stable across runs ==")
    return 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
