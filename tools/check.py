#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py <outDir> <sfDir>
Reads each <outDir>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB against the
sfDir parquet tables, and compares row counts + sorted values.
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    # always a string: NaN/None floats break tuple sorting (nan is
    # neither < nor == anything), and a None among floats would make
    # positions mixed-type — strings keep every position orderable.
    # Floats compare at FULL precision (the driver's gate hashes exact
    # values — round(v, 6) here let a cross-engine ulp slip through in
    # round 8); `+ 0.0` collapses -0.0 to 0.0 first so a signed zero
    # isn't a false mismatch.
    if isinstance(v, float):
        return "__nan__" if v != v else str(v + 0.0)
    if v is None:
        return "__none__"
    return str(v)

def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        res_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = con.sql(f"SELECT * FROM '{res_dir}/*.parquet'").df()
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        gc, wc = sorted(got.columns), sorted(want.columns)
        if gc != wc:
            print(f"FAIL {name}: columns {gc} != {wc}")
            n_fail += 1
            continue
        g = sorted(tuple(norm(v) for v in row) for row in got[gc].itertuples(index=False))
        w = sorted(tuple(norm(v) for v in row) for row in want[wc].itertuples(index=False))
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            n_fail += 1
        elif g != w:
            bad = next(i for i, (a, b) in enumerate(zip(g, w)) if a != b)
            print(f"FAIL {name}: values differ at sorted-row {bad}:\n  spark={g[bad]}\n  duck ={w[bad]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
