"""stump_screen: histogram-split decision-stump feature screening."""

import pytest
from pyspark.sql import functions as F

from feathr_spark.operators.screening import stump_screen


def test_stump_finds_perfect_separator(spark):
    # label = (x >= 50) and the class flip sits exactly on a bin edge
    # of the [0, 100] 10-bin grid: the best split must recover it and
    # reach zero post-split impurity
    rows = [(float(i), i >= 50) for i in range(101)]
    df = spark.createDataFrame(rows, "x double, y boolean")
    out = {r["feature"]: r for r in
           stump_screen(df, ["x"], "y", bins=10).collect()}
    r = out["x"]
    assert r["gini_split"] == 0.0
    assert r["gini_gain"] == r["gini_root"]
    assert r["threshold"] == pytest.approx(50.0)
    assert r["n_left"] == 50 and r["n_right"] == 51


def test_stump_noise_feature_gains_nothing(spark):
    # feature independent of label: gain ~ 0, far below a signal feature
    rows = [(float(i % 7), float(i), i % 2 == 0) for i in range(200)]
    df = spark.createDataFrame(rows, "noise double, signal double, "
                                     "y boolean")
    out = {r["feature"]: r for r in
           stump_screen(df, ["noise", "signal"], "y", bins=8).collect()}
    assert out["noise"]["gini_gain"] <= out["signal"]["gini_gain"]


def test_stump_constant_feature_yields_no_row(spark):
    df = spark.createDataFrame([(5.0, True), (5.0, False)],
                               "x double, y boolean")
    assert stump_screen(df, ["x"], "y").count() == 0


def test_stump_root_gini_hand_computed(spark):
    # 30 pos / 70 neg -> root gini = 2 * .3 * .7 = .42
    rows = [(float(i), i < 30) for i in range(100)]
    df = spark.createDataFrame(rows, "x double, y boolean")
    r = stump_screen(df, ["x"], "y", bins=4).collect()[0]
    assert r["gini_root"] == pytest.approx(0.42)


def test_stump_null_rows_excluded(spark):
    rows = [(float(i), i > 10) for i in range(20)] + [(None, True)] * 5
    df = spark.createDataFrame(rows, "x double, y boolean")
    r = stump_screen(df, ["x"], "y", bins=4).collect()[0]
    assert r["n_left"] + r["n_right"] == 20


def test_stump_partitioning_invariance(spark):
    rows = [(float((i * 37) % 101), (i * 13) % 3 == 0)
            for i in range(500)]
    df = spark.createDataFrame(rows, "x double, y boolean")
    a = stump_screen(df, ["x"], "y").collect()
    b = stump_screen(df.repartition(17), ["x"], "y").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
