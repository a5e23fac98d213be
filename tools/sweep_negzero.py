#!/usr/bin/env python3
"""Dev-only sweep: run every oracle SQL at the given SF dirs and report
any cell that is IEEE negative zero. Spark's Catalyst Round (BigDecimal)
can never emit -0.0, so any oracle-side -0.0 at a rounding boundary is a
guaranteed driver hash mismatch (the q79 class). Exit 1 on any hit.

Usage: python3 tools/sweep_negzero.py <verifyOutDir> <sfDir> [<sfDir>...]
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def scan(v):
    if isinstance(v, float):
        return v == 0.0 and math.copysign(1.0, v) < 0
    if isinstance(v, (list, tuple)):
        return any(scan(x) for x in v)
    return False


def main():
    out_dir, sf_dirs = sys.argv[1], sys.argv[2:]
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    hits = 0
    for sf_dir in sf_dirs:
        con = duckdb.connect()
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{sf_dir}/{t}.parquet')")
        for name in sorted(oracle):
            try:
                df = con.execute(oracle[name]).df()
            except Exception as e:
                print(f"ERR  {sf_dir} {name}: {e}")
                hits += 1
                continue
            n = sum(1 for row in df.itertuples(index=False, name=None)
                    for v in row if scan(v))
            if n:
                print(f"HIT  {sf_dir} {name}: {n} negative-zero cells")
                hits += 1
        con.close()
        print(f"== {sf_dir}: swept {len(oracle)} oracles")
    sys.exit(1 if hits else 0)


if __name__ == "__main__":
    main()
