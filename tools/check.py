#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: reads Verify output
(parquet per query + oracle_sql.json), runs each oracle in DuckDB over the
fixture tables, and diffs values with columns sorted by name.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import glob
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    return v


def frame(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return [tuple(norm_cell(r[i]) for i in order) for r in rows], \
           [cols[i] for i in order]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name in sorted(oracle):
        sql = oracle[name]
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            failures += 1
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchall()
        got_cols = [d[0] for d in con.description]
        try:
            want = con.execute(sql).fetchall()
            want_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            failures += 1
            continue
        g, gc = frame(got, got_cols)
        w, wc = frame(want, want_cols)
        if gc != wc:
            print(f"FAIL {name}: columns spark={gc} duck={wc}")
            failures += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows spark={len(g)} duck={len(w)}")
            failures += 1
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(g, w)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(g)} rows differ; "
                  f"first at {i} (cols {gc}):\n  spark={a}\n  duck ={b}")
            failures += 1
        else:
            print(f"ok   {name} ({len(g)} rows)")
    # rows-only queries (no oracle)
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = d.rstrip("/").split("/")[-1]
        if name in oracle:
            continue
        files = glob.glob(f"{d}/*.parquet")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0] \
            if files else 0
        status = "ok  " if n > 0 else "FAIL"
        if n == 0:
            failures += 1
        print(f"{status} {name} (rows-only, {n} rows)")
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
