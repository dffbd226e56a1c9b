"""Capture `.explain("formatted")` for named queries into plans/<tag>/.

Usage: python scripts/capture_plans.py <tag> <suffix> q1 [q2 ...]
  writes plans/<tag>/<query>_<suffix>.txt  (suffix: before|after)

Plans are captured at sf0.001 (same as tests/test_plan_quality.py —
plan SHAPE is scale-independent; only AQE runtime re-optimization
differs, and explain shows the initial plan either way).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession

import __spark_entry__ as entrymod


def main():
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    outdir = os.path.join(REPO, "plans", tag)
    os.makedirs(outdir, exist_ok=True)
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("feathr_spark-plans")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    for name in names:
        spark.catalog.clearCache()
        df = qs[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
