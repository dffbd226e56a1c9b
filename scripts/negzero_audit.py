"""Signed-zero fragility audit (r10): run every oracle_sql() on DuckDB
at the given sf dirs and report queries whose output contains a -0.0
double cell. Any such query sits one data-rotation away from the
robust_scale_price/zscore_price class (DuckDB ROUND of a tiny negative
emits -0.0 where Spark emits +0.0), so flagged queries get the `+ 0.0`
normalization on BOTH sides. Oracle-only (no Spark session) — the
Spark side's matching cell is covered by the bit-level sweeps.

Usage: python scripts/negzero_audit.py [sf_dir ...]
"""
import math
import os
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import duckdb

import __spark_entry__ as ent

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
NEG_ZERO = struct.pack(">d", -0.0)


def has_negzero(v):
    if isinstance(v, float):
        return not math.isnan(v) and struct.pack(">d", v) == NEG_ZERO
    if isinstance(v, (list, tuple)):
        return any(has_negzero(x) for x in v)
    if isinstance(v, dict):
        return any(has_negzero(x) for x in v.values())
    return False


def main():
    dirs = sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    oracles = ent.oracle_sql()
    flagged = {}
    for sf in dirs:
        con = duckdb.connect()
        con.execute("SET memory_limit='24GB'")
        con.execute("SET max_temp_directory_size='20GB'")
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{sf}/{t}.parquet')")
        for name, sql in oracles.items():
            try:
                rows = con.execute(sql).fetchall()
            except Exception as e:
                print(f"{name}: ERROR {e}")
                continue
            hits = sum(1 for r in rows for v in r if has_negzero(v))
            if hits:
                flagged.setdefault(name, {})[sf] = hits
        con.close()
    if flagged:
        print("NEGATIVE-ZERO EMITTERS (oracle side):")
        for name, per in sorted(flagged.items()):
            print(f"  {name}: {per}")
        sys.exit(1)
    print("clean: no oracle emits -0.0 at", dirs)


if __name__ == "__main__":
    main()
