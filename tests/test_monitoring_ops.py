"""Robust-monitoring operators: MAD outliers, EWMA smoothing,
period-over-period growth. Values pinned against hand computation."""

import pytest

from pyspark.sql import functions as F

from feathr_spark.operators.scaling import mad_outliers
from feathr_spark.operators.timeseries import ewma_smooth, period_growth


def test_mad_outliers_flags_only_the_planted_spike(spark):
    # group a: tight cluster + one spike; group b: constant (MAD=0)
    rows = [("a", float(i), 10.0 + (i % 5) * 0.1) for i in range(20)]
    rows.append(("a", 99.0, 500.0))
    rows += [("b", float(i), 7.0) for i in range(10)]
    df = spark.createDataFrame(rows, ["g", "rid", "v"])
    out = mad_outliers(df, "v", by=["g"], k=3.5).collect()
    flagged = [(r["g"], r["rid"]) for r in out if r["is_outlier"]]
    assert flagged == [("a", 99.0)]
    # zero-MAD group: NULL robust_z, never flagged
    bz = [r for r in out if r["g"] == "b"]
    assert all(r["robust_z"] is None and not r["is_outlier"] for r in bz)
    # robust_z matches the hand formula on the spike
    spike = [r for r in out if r["rid"] == 99.0][0]
    med = sorted([v for g, _, v in rows if g == "a"])[10]  # 21 values
    devs = sorted(abs(v - med) for g, _, v in rows if g == "a")
    mad = devs[10]
    assert spike["robust_z"] == pytest.approx(
        (500.0 - med) / (1.4826 * mad), rel=1e-9)


def test_ewma_matches_hand_recursion_per_key(spark):
    rows = []
    for day, x in [(1, 10.0), (2, 20.0), (3, 10.0), (4, 40.0)]:
        rows.append(("k1", f"2024-01-0{day} 05:00:00", x))
    rows.append(("k2", "2024-01-01 09:00:00", 100.0))
    rows.append(("k2", "2024-01-03 09:00:00", 50.0))
    df = (spark.createDataFrame(rows, ["k", "ts", "v"])
          .withColumn("ts", F.col("ts").cast("timestamp")))
    out = ewma_smooth(df, "ts", "v", key_cols=["k"], bucket="day",
                      alpha=0.5)
    got = {(r["k"], str(r["bucket_ts"])[:10]): r["ewma"]
           for r in out.collect()}
    # k1: 10, .5*20+.5*10=15, .5*10+.5*15=12.5, .5*40+.5*12.5=26.25
    assert got[("k1", "2024-01-01")] == 10.0
    assert got[("k1", "2024-01-02")] == 15.0
    assert got[("k1", "2024-01-03")] == 12.5
    assert got[("k1", "2024-01-04")] == 26.25
    # k2 recursion independent of k1 (gap day simply absent)
    assert got[("k2", "2024-01-01")] == 100.0
    assert got[("k2", "2024-01-03")] == 75.0


def test_ewma_multiple_events_sum_within_bucket(spark):
    rows = [("2024-02-01 01:00:00", 3.0), ("2024-02-01 02:00:00", 7.0),
            ("2024-02-02 01:00:00", 20.0)]
    df = (spark.createDataFrame(rows, ["ts", "v"])
          .withColumn("ts", F.col("ts").cast("timestamp")))
    out = {str(r["bucket_ts"])[:10]: (r["bucket_value"], r["ewma"])
           for r in ewma_smooth(df, "ts", "v", alpha=0.25).collect()}
    assert out["2024-02-01"] == (10.0, 10.0)
    assert out["2024-02-02"][0] == 20.0
    assert out["2024-02-02"][1] == pytest.approx(0.25 * 20 + 0.75 * 10)


def test_period_growth_mom_and_lag2(spark):
    rows = [("a", f"2024-0{m}-15 00:00:00", float(v))
            for m, v in [(1, 100), (2, 110), (3, 99), (4, 198)]]
    df = (spark.createDataFrame(rows, ["k", "ts", "v"])
          .withColumn("ts", F.col("ts").cast("timestamp")))
    mom = {str(r["bucket_ts"])[:7]: (r["prev_value"], r["growth_pct"])
           for r in period_growth(df, "ts", "v", key_cols=["k"],
                                  bucket="month", lag=1).collect()}
    assert mom["2024-01"] == (None, None)
    assert mom["2024-02"][1] == pytest.approx(0.10)
    assert mom["2024-03"][1] == pytest.approx(-0.10)
    assert mom["2024-04"][1] == pytest.approx(1.0)
    lag2 = {str(r["bucket_ts"])[:7]: r["growth_pct"]
            for r in period_growth(df, "ts", "v", key_cols=["k"],
                                   bucket="month", lag=2).collect()}
    assert lag2["2024-01"] is None and lag2["2024-02"] is None
    assert lag2["2024-03"] == pytest.approx(-0.01)
    assert lag2["2024-04"] == pytest.approx(0.8)


def test_period_growth_zero_previous_is_null(spark):
    rows = [("2024-01-01 00:00:00", 0.0), ("2024-02-01 00:00:00", 5.0)]
    df = (spark.createDataFrame(rows, ["ts", "v"])
          .withColumn("ts", F.col("ts").cast("timestamp")))
    out = {str(r["bucket_ts"])[:7]: r["growth_pct"]
           for r in period_growth(df, "ts", "v", bucket="month").collect()}
    assert out["2024-02"] is None


def test_mad_outliers_null_key_group_scored(spark):
    # NULL group key forms a scored group (null-safe key match), instead
    # of groupBy-ing into a row that the attach join then drops
    rows = [(None, float(i), 10.0 + (i % 5) * 0.1) for i in range(20)]
    rows.append((None, 99.0, 500.0))
    rows += [("a", float(i), 7.0) for i in range(10)]
    df = spark.createDataFrame(rows, "g string, rid double, v double")
    out = mad_outliers(df, "v", by=["g"], k=3.5).collect()
    assert len(out) == len(rows)  # every input row survives the attach
    nulls = [r for r in out if r["g"] is None]
    assert len(nulls) == 21
    assert [(r["rid"]) for r in nulls if r["is_outlier"]] == [99.0]
    assert all(r["grp_median"] is not None for r in nulls)


def test_null_key_groups_scored_across_attach_operators(spark):
    """The r7 null-safe attach sweep (_join.broadcast_attach): every
    groupBy-then-attach operator must score rows whose group key is
    NULL instead of dropping/NULLing them through the equi-join."""
    from feathr_spark.operators.scaling import (quantile_bins,
                                                robust_scale,
                                                standardize, winsorize)
    from feathr_spark.operators.distance import js_divergence
    rows = ([(None, float(i)) for i in range(10)]
            + [("a", float(i * 2)) for i in range(10)])
    df = spark.createDataFrame(rows, "g string, v double")

    out = robust_scale(df.withColumn("rid", F.col("v")), "v", "rid",
                       by=["g"]).collect()
    assert len(out) == 20
    assert all(r.robust is not None for r in out if r.g is None)

    out = winsorize(df, "v", by=["g"], p_lo=0.1, p_hi=0.9).collect()
    assert all(r.v_wins is not None for r in out if r.g is None)

    out = standardize(df, ["v"], by=["g"]).collect()
    assert all(r.v_z is not None for r in out if r.g is None)

    out = quantile_bins(df, "v", bins=2, by=["g"]).collect()
    assert all(r.v_bin is not None for r in out if r.g is None)

    # jsd: NULL group key forms a compared distribution; NULL category
    # is a category
    rows2 = ([(None, "x")] * 5 + [(None, "y")] * 5
             + [("a", "x")] * 5 + [("a", None)] * 5)
    df2 = spark.createDataFrame(rows2, "g string, c string")
    out = {r.g: r for r in js_divergence(df2, "c", by=["g"]).collect()}
    assert set(out) == {None, "a"}
    assert all(r.jsd is not None for r in out.values())


def test_cusum_null_key_series_survives(spark):
    import datetime as dt
    from feathr_spark.operators.forecast import cusum_changepoints
    rows = [(None, dt.datetime(2024, 1, 1 + i), float(i)) for i in range(6)]
    rows += [("a", dt.datetime(2024, 1, 1 + i), float(i % 2)) for i in range(6)]
    df = spark.createDataFrame(rows, "g string, ts timestamp, v double")
    out = cusum_changepoints(df, "ts", "v", key_cols=["g"]).collect()
    gs = {r.g for r in out}
    assert gs == {None, "a"}


def test_selection_mode_bit_identical_across_operators(spark):
    """percentile_mode='selection' (distributed-selection exact
    percentiles — no task ever buffers the value multiset) must be
    BIT-identical to the default buffer-aggregate mode on every
    operator exposing it."""
    import random
    from feathr_spark.operators.scaling import (mad_outliers,
                                                quantile_bins,
                                                robust_scale, winsorize)
    from feathr_spark.operators.funnel import funnel_latency
    random.seed(23)
    vals = ([random.gauss(100, 25) for _ in range(400)]
            + [7.5] * 60 + [None, None, 1e7, -1e7])
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "rid bigint, v double")

    def rowset(out, cols):
        return sorted((r["rid"], *[r[c] for c in cols])
                      for r in out.collect())

    a = winsorize(df, "v", p_lo=0.05, p_hi=0.95)
    b = winsorize(df, "v", p_lo=0.05, p_hi=0.95,
                  percentile_mode="selection")
    assert rowset(a, ["v_wins", "v_lo", "v_hi"]) == \
           rowset(b, ["v_wins", "v_lo", "v_hi"])

    a = quantile_bins(df, "v", bins=7, round_cuts_dp=4)
    b = quantile_bins(df, "v", bins=7, round_cuts_dp=4,
                      percentile_mode="selection")
    assert rowset(a, ["v_bin"]) == rowset(b, ["v_bin"])

    a = robust_scale(df, "v", "rid")
    b = robust_scale(df, "v", "rid", percentile_mode="selection")
    assert rowset(a, ["robust"]) == rowset(b, ["robust"])

    a = mad_outliers(df, "v")
    b = mad_outliers(df, "v", percentile_mode="selection")
    assert rowset(a, ["robust_z", "is_outlier"]) == \
           rowset(b, ["robust_z", "is_outlier"])

    import datetime as dt
    t0 = dt.datetime(2024, 1, 1)
    ev = []
    for u in range(40):
        ev.append((u, "signup", t0 + dt.timedelta(hours=u)))
        if u % 3:
            ev.append((u, "purchase",
                       t0 + dt.timedelta(hours=u, minutes=7 * u % 90)))
    evdf = spark.createDataFrame(ev, "u bigint, t string, ts timestamp")
    fa = funnel_latency(evdf, "u", "t", "ts", "signup",
                        "purchase").collect()[0]
    fb = funnel_latency(evdf, "u", "t", "ts", "signup", "purchase",
                        percentile_mode="selection").collect()[0]
    assert fa.asDict() == fb.asDict()


def test_robust_scale_quantized_cuts_cross_engine_bit_exact(spark, sf_dir):
    """The r9 fix for the r7/r8 driver red: with round_cuts_dp=4 the
    quotient inputs are quantized to the 4-dp grid on BOTH engines, so
    robust_scale output is BIT-identical to an independent DuckDB
    evaluation — and provably invariant to the ulp-level
    percentile-interpolation drift that actually caused the red (shown
    by perturbing the quartiles a few ulp and re-rounding)."""
    import math

    import duckdb

    from feathr_spark.operators.scaling import robust_scale
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    out = robust_scale(orders, "o_totalprice", "o_orderkey",
                       round_cuts_dp=4)
    got = {r.o_orderkey: (r.value, r.robust) for r in out.collect()}

    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * "
                f"FROM '{sf_dir}/orders.parquet'")
    ora = {k: (v, rb) for k, v, rb in con.execute("""
        WITH cuts AS (
          SELECT ROUND(quantile_cont(o_totalprice, 0.25), 4) AS q1,
                 ROUND(quantile_cont(o_totalprice, 0.5), 4) AS med,
                 ROUND(quantile_cont(o_totalprice, 0.75), 4) AS q3
          FROM orders WHERE o_totalprice IS NOT NULL)
        SELECT o_orderkey,
               ROUND(o_totalprice + 1e-9, 4) AS value,
               ROUND(CASE WHEN q3 - q1 > 0 THEN
                     (o_totalprice - med) / (q3 - q1) END + 1e-9, 4)
        FROM orders, cuts""").fetchall()}
    assert got.keys() == ora.keys()
    # bit-exact: no rounding slack in the comparison at all
    assert all(got[k] == ora[k] for k in got)

    # drift immunity: a quartile off by a few ulp (the cross-DuckDB
    # quantile_cont divergence class) rounds to the IDENTICAL 4-dp cut
    q1, med, q3 = con.execute("""
        SELECT quantile_cont(o_totalprice, 0.25),
               quantile_cont(o_totalprice, 0.5),
               quantile_cont(o_totalprice, 0.75)
        FROM orders WHERE o_totalprice IS NOT NULL""").fetchone()
    for q in (q1, med, q3):
        up, down = q, q
        for _ in range(4):  # +-4 ulp
            up = math.nextafter(up, math.inf)
            down = math.nextafter(down, -math.inf)
        assert round(up, 4) == round(q, 4) == round(down, 4)
