#!/usr/bin/env python3
"""Local pre-validation of the driver's DuckDB-oracle compare.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query, loads the Spark parquet result and runs the oracle SQL in
DuckDB against the same fixture tables, then compares schema (column
names), row count, and cell values IN ORDER. Exact match for
ints/strings; doubles must be bitwise-equal (our arithmetic is
order-deterministic by construction) — any diff is reported with the
first mismatching row.

Dev-only tool (driver-side python env); not part of the shipped library.
"""
import json, math, sys, glob, os
import duckdb
import pyarrow.parquet as pq

def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_ok = n_bad = 0
    for name in sorted(oracle):
        path = f"{out_dir}/{name}"
        files = glob.glob(f"{path}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output at {path}")
            n_bad += 1
            continue
        try:
            got = pq.read_table(path).to_pylist()
            want_rel = con.sql(oracle[name])
            want_cols = want_rel.columns
            want = [dict(zip(want_cols, r)) for r in want_rel.fetchall()]
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_bad += 1
            continue
        got_cols = sorted(got[0].keys()) if got else sorted(
            pq.read_schema(files[0]).names)
        if sorted(want_cols) != got_cols:
            print(f"FAIL {name}: cols spark={got_cols} oracle={sorted(want_cols)}")
            n_bad += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows spark={len(got)} oracle={len(want)}")
            n_bad += 1
            continue
        bad = None
        for i, (g, w) in enumerate(zip(got, want)):
            for c in want_cols:
                gv, wv = g[c], w[c]
                if isinstance(gv, float) and isinstance(wv, float):
                    eq = (gv == wv) or (math.isnan(gv) and math.isnan(wv))
                else:
                    eq = str(gv) == str(wv)
                if not eq:
                    bad = (i, c, gv, wv)
                    break
            if bad:
                break
        if bad:
            i, c, gv, wv = bad
            print(f"FAIL {name}: row {i} col {c}: spark={gv!r} oracle={wv!r}")
            n_bad += 1
        else:
            print(f"OK   {name} ({len(got)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail ==")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
