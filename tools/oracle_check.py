#!/usr/bin/env python3
"""DEV-ONLY local emulation of the driver's DuckDB oracle gate.

Not part of the shipped library (the engine itself is pure Scala/Spark).
Usage: after `sbt "runMain graft.Verify <sfDir> <outDir>"`:

    python3 tools/oracle_check.py <sfDir> <outDir>

Compares each <outDir>/<name>/ parquet result against DuckDB running
oracle_sql.json on the same source tables: columns sorted by name,
rows sorted, exact value compare (mirrors the driver's hash compare).
"""
import glob
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df[sorted(df.columns)]
    rows = []
    for t in df.itertuples(index=False):
        row = []
        for v in t:
            if isinstance(v, float):
                # exact compare — mirrors the driver's hash of raw values
                v = "NaN" if math.isnan(v) else repr(v)
            row.append(str(v))
        rows.append(tuple(row))
    return sorted(rows)


def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    with open(f"{outdir}/oracle_sql.json") as f:
        oracle = json.load(f)
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = duckdb.read_parquet(files).df()
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        cg, ce = canon(got), canon(exp)
        if sorted(got.columns) != sorted(exp.columns):
            print(f"FAIL {name}: columns {sorted(got.columns)} != {sorted(exp.columns)}")
            n_fail += 1
        elif cg != ce:
            diff = [(a, b) for a, b in zip(cg, ce) if a != b]
            print(f"FAIL {name}: {len(cg)} vs {len(ce)} rows; first diffs: {diff[:3]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(cg)} rows)")
            n_pass += 1
    extra = set(glob.glob(f"{outdir}/*/")) and None
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
