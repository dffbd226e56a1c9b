"""Local stand-in for the driver's correctness gate.

Runs every __spark_entry__.queries() entry on Spark and its oracle_sql()
on DuckDB at the given sf dir, then compares row count, column names, and
order-insensitive values (columns sorted by name, rows sorted).

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
       python scripts/check_oracles.py --json OUT.json [sf_dir]
       python scripts/check_oracles.py --exact [sf_dir] [query ...]

--exact compares floats by their IEEE-754 BIT PATTERN (struct.pack,
NaN normalized to a single token) instead of rounding to 4 dp. The
default 4-dp normalization is WEAKER than the driver's exact value-hash
(the r7/r8 robust_scale_price reds passed the rounded local sweep for
two rounds), and plain Python ``==`` is weaker still: it conflates
-0.0 with +0.0, which is exactly the class that kept robust_scale_price
red at the driver through r9 while ``--exact`` stayed green. Bit-level
--exact distinguishes ±0.0 like the driver's value-hash does — a query
that passes bit-level --exact cannot hash-mismatch on any engine that
computes the same doubles. Chase any suspected ulp- or signed-zero-
class divergence with --exact, never with the rounded sweep.

--json writes the per-query verdicts as a committed, diffable artifact
(the LOCAL_ORACLES_r{N}.json ritual: the driver's gate window covers 50
queries per round; this closes the rest with a hard recorded signal).
"""

from __future__ import annotations

import math
import os
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as entrymod

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


EXACT = False  # set by --exact: bit-exact float compare (driver-strength)


def _bits(f):
    """IEEE-754 bit pattern of a double as a hex token.

    This is the driver-strength comparison: it distinguishes -0.0 from
    +0.0 (Python == does not), with NaN normalized to one token since
    engines may emit different NaN payloads for the same NaN result.
    """
    if math.isnan(f):
        return "NaN"
    return struct.pack(">d", f).hex()


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return _bits(v) if EXACT else round(v, 4)
    if isinstance(v, list):
        return tuple(norm_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm_cell(x)) for k, x in v.items()))
    if hasattr(v, "asDict"):  # pyspark Row (struct)
        return tuple(sorted((k, norm_cell(x)) for k, x in v.asDict().items()))
    import decimal
    if isinstance(v, decimal.Decimal):
        # decimal-typed cells compare through the same double bit
        # pattern in --exact mode (string form would keep trailing-zero
        # scale in the comparison)
        return _bits(float(v)) if EXACT else round(float(v), 4)
    return v


def normalize(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return out


def main():
    args = sys.argv[1:]
    global EXACT
    if "--exact" in args:
        EXACT = True
        args = [a for a in args if a != "--exact"]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        args = args[:i] + args[i + 2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    spark = (SparkSession.builder.master("local[8]")
             .appName("oracle-check")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    con = duckdb.connect()
    # spill guard (r9 incident: one sweep's DuckDB spill grew past 67 GB
    # in .tmp and nearly filled the disk before being killed): bound the
    # oracle's memory AND its temp directory so a pathological plan
    # fails fast with a clear error instead of taking the host down —
    # every oracle in the registry runs comfortably inside these caps
    con.execute("SET memory_limit='24GB'")
    con.execute("SET max_temp_directory_size='20GB'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    verdicts = {}
    from pyspark.sql.types import ArrayType, MapType, StructType
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        # Pre-flight (r7 jl_project lesson): the driver's canonicalizer
        # pandas-sorts result cells and CRASHES on unhashable list/dict
        # cells — an oracle-bearing query must never emit array/map/struct
        # columns (serialize to one joined string, see q_elementwise_avg).
        complex_cols = [f.name for f in sdf.schema.fields
                        if isinstance(f.dataType,
                                      (ArrayType, MapType, StructType))]
        if complex_cols and name in oracles:
            failures.append(name)
            print(f"{name:25s} FAIL  COMPLEX-TYPE output columns "
                  f"{complex_cols} (driver hasher cannot digest these; "
                  f"serialize as joined strings)")
            verdicts[name] = {"status": "fail", "rows": None,
                              "detail": f"complex-type cols {complex_cols}"}
            continue
        srows = sdf.collect()
        scols = sdf.columns
        if name not in oracles:
            print(f"{name:25s} rows={len(srows)} (rows-only check: no oracle)")
            verdicts[name] = {"status": "rows_only", "rows": len(srows)}
            continue
        orc = con.execute(oracles[name])
        ocols = [d[0] for d in orc.description]
        orows = orc.fetchall()
        status = []
        if len(srows) != len(orows):
            status.append(f"ROWCOUNT spark={len(srows)} oracle={len(orows)}")
        if sorted(scols) != sorted(ocols):
            status.append(f"SCHEMA spark={sorted(scols)} oracle={sorted(ocols)}")
        if not status:
            a = normalize([tuple(r) for r in srows], scols)
            b = normalize(orows, ocols)
            if a != b:
                n_bad = sum(1 for x, y in zip(a, b) if x != y)
                status.append(f"VALUES mismatch ({n_bad} differing rows)")
                for x, y in list(zip(a, b))[:2000]:
                    if x != y:
                        status.append(f"  spark : {x}\n  oracle: {y}")
                        break
        if status:
            failures.append(name)
            print(f"{name:25s} FAIL  " + " | ".join(status[:3]))
            verdicts[name] = {"status": "fail", "rows": len(srows),
                              "detail": status[0]}
        else:
            print(f"{name:25s} OK    rows={len(srows)}")
            verdicts[name] = {"status": "ok", "rows": len(srows)}
    spark.stop()
    if json_out:
        import json
        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "results": verdicts}, f, indent=1,
                      sort_keys=True)
        print(f"wrote {json_out} ({len(verdicts)} verdicts)")
    if failures:
        print("FAILED:", failures)
        sys.exit(1)
    print("all oracle checks passed"
          + (" (BIT-exact float compare)" if EXACT else ""))


if __name__ == "__main__":
    main()
