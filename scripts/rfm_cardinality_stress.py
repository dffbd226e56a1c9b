"""Extreme-key-cardinality stress for rfm_scores (VERDICT r7 item 7).

rfm_scores has two scoring paths: ``ntile`` (exact equal-frequency,
but three GLOBAL ntile windows single-partition-sort the customer
frame) and ``cuts`` (selection-percentile cut literals + row-local
count-below scoring — no window, no single-task buffer). This script
measures both at growing key cardinality K on generated data (no
files; ~3 orders per key via spark.range), timing the full call +
noop-sink materialization (the cuts path is eager by contract, so the
call itself is part of the cost), and fits the growth exponent
log t ~ a + b log K per path.

Expected shape: ntile's single-task sort grows superlinearly in K and
dominates; cuts stays flat-ish (histogram passes are fully parallel).

    python scripts/rfm_cardinality_stress.py            # K = 2e5,6e5,1e6
    python scripts/rfm_cardinality_stress.py 100000 400000
"""
from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from feathr_spark.operators.encoding import rfm_scores


def gen_orders(spark, n_keys: int):
    """~3 orders per key, deterministic pseudo-random amounts/dates from
    md5 so every run and both paths see identical data."""
    rows = spark.range(0, n_keys * 3).select(
        (F.col("id") % n_keys).alias("custkey"),
        F.to_timestamp(F.lit("2024-01-01")).alias("t0"),
        F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 8),
               16, 10).cast("bigint").alias("h"))
    return rows.select(
        "custkey",
        F.timestamp_seconds(F.unix_timestamp("t0")
                            + (F.col("h") % 31536000)).alias("ts"),
        ((F.col("h") % 100000) / 100.0 + 1.0).alias("amount"))


def run_once(spark, n_keys: int, method: str) -> float:
    df = gen_orders(spark, n_keys)
    t0 = time.perf_counter()
    out = rfm_scores(df, "custkey", "ts", "amount", method=method)
    out.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    ks = [int(x) for x in sys.argv[1:]] or [200_000, 600_000, 1_000_000]
    spark = (SparkSession.builder.master("local[32]")
             .appName("rfm-cardinality-stress")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "8g")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    # warmup (codegen) on a tiny frame
    for m in ("ntile", "cuts"):
        run_once(spark, 10_000, m)
    results: dict[str, list[float]] = {"ntile": [], "cuts": []}
    for k in ks:
        for m in ("ntile", "cuts"):
            t = min(run_once(spark, k, m) for _ in range(2))
            results[m].append(t)
            print(f"K={k:>9,}  {m:5s}  {t:6.2f} s", flush=True)
    for m, ts in results.items():
        if len(ts) >= 2:
            b = ((math.log(ts[-1]) - math.log(ts[0]))
                 / (math.log(ks[-1]) - math.log(ks[0])))
            print(f"{m}: exponent {b:.2f} across {ks[0]:,}->{ks[-1]:,}")
    spark.stop()


if __name__ == "__main__":
    main()
