#!/usr/bin/env python3
"""Dev-only pre-flight for the driver's correctness gate.

Runs Verify's parquet dumps against the DuckDB oracle SQL (oracle_sql.json)
and compares: schema (column names), row count, and cell values after
sorting columns by name and rows by all columns — a strict superset of the
driver's hash compare. NOT part of the shipped library (driver-side python).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # sign-of-zero aware: the driver's hash distinguishes -0.0 from
        # +0.0 (DuckDB round() preserves IEEE sign; Spark's BigDecimal
        # Round cannot), so the pre-flight must too — int(v) would erase it
        if v == 0.0:
            return "-0.0" if math.copysign(1.0, v) < 0 else "0.0"
        if v == int(v) and abs(v) < 1e15:
            return repr(int(v) * 1.0)
        return repr(v)
    return str(v)


def frame_repr(df):
    cols = sorted(df.columns)
    rows = [tuple(norm_cell(v) for v in row)
            for row in df[cols].itertuples(index=False, name=None)]
    rows.sort()
    return cols, rows


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    # Verify writes attempted.json listing every query it tried to dump.
    # A SPARK_GRAFT_QUERIES-filtered run legitimately omits the rest, but
    # an ATTEMPTED query with no dump dir means it crashed inside Verify
    # — that must be a FAIL, not a silent skip (the gate must not shrink).
    manifest_path = f"{out_dir}/attempted.json"
    attempted = set(json.load(open(manifest_path))) \
        if os.path.exists(manifest_path) else set(oracle)
    oracle = {k: v for k, v in oracle.items() if k in attempted}
    for name in sorted(oracle):
        if not os.path.isdir(f"{out_dir}/{name}"):
            print(f"FAIL {name}: attempted but no dump dir (crashed in Verify)")
            n_fail += 1
            continue
        sql = oracle[name]
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        gc, gr = frame_repr(got)
        wc, wr = frame_repr(want)
        if gc != wc:
            print(f"FAIL {name}: columns {gc} != {wc}")
            n_fail += 1
            continue
        if len(gr) != len(wr):
            print(f"FAIL {name}: rows {len(gr)} != {len(wr)}")
            n_fail += 1
            continue
        bad = [(a, b) for a, b in zip(gr, wr) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)} mismatched rows; first: "
                  f"spark={bad[0][0]} duckdb={bad[0][1]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(gr)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
