"""Value tests for the round-6 commerce/behavior operators:
price_indices, fano_factor, funnel_latency."""
import math

import pytest
from pyspark.sql import functions as F

from feathr_spark.operators.funnel import funnel_latency
from feathr_spark.operators.olap import price_indices
from feathr_spark.operators.sessions import fano_factor


def test_price_indices_textbook(spark):
    # two items, two periods; hand-computed Laspeyres/Paasche/Fisher.
    # rows: (item, period, revenue, qty) with unit value rev/qty
    rows = [
        ("a", 1, 10.0, 10.0),   # p0=1.0
        ("b", 1, 20.0, 10.0),   # p0=2.0
        ("a", 2, 24.0, 12.0),   # p=2.0 (x2)
        ("b", 2, 5.0, 5.0),     # p=1.0 (x0.5)
    ]
    df = spark.createDataFrame(rows, "k string, p int, rev double, q double")
    out = {r["period"]: r for r in
           price_indices(df, "k", "p", "rev", "q").collect()}
    assert out[1]["laspeyres"] == 1.0 and out[1]["paasche"] == 1.0
    # L2 = (2*10 + 1*10) / (1*10 + 2*10) = 30/30 = 1.0
    assert abs(out[2]["laspeyres"] - 1.0) < 1e-9
    # P2 = (2*12 + 1*5) / (1*12 + 2*5) = 29/22
    assert abs(out[2]["paasche"] - 29 / 22) < 1e-6
    assert abs(out[2]["fisher"] - math.sqrt(29 / 22)) < 1e-6
    assert out[2]["n_items"] == 2


def test_price_indices_matched_sample_only(spark):
    # item "new" absent from the base period must not enter any index
    rows = [("a", 1, 10.0, 10.0), ("a", 2, 20.0, 10.0),
            ("new", 2, 99.0, 1.0)]
    df = spark.createDataFrame(rows, "k string, p int, rev double, q double")
    out = {r["period"]: r for r in
           price_indices(df, "k", "p", "rev", "q").collect()}
    assert out[2]["n_items"] == 1
    assert abs(out[2]["laspeyres"] - 2.0) < 1e-9


def test_fano_poisson_like_vs_bursty(spark):
    rows = []
    # user 1: one event per hour over 10 hours -> variance 0, fano 0
    rows += [(1, f"2024-01-01 {h:02d}:30:00") for h in range(10)]
    # user 2: 10 events in hour 0, none in hours 1..9, 10 in hour 10
    rows += [(2, "2024-01-01 00:15:00")] * 10
    rows += [(2, "2024-01-01 10:15:00")] * 10
    df = spark.createDataFrame(rows, "user_id int, ts string")
    out = {r["user_id"]: r for r in
           fano_factor(df, "user_id", "ts", 3600).collect()}
    assert out[1]["span_buckets"] == 10 and out[1]["active_buckets"] == 10
    assert abs(out[1]["fano"] - 0.0) < 1e-9
    r2 = out[2]
    assert r2["span_buckets"] == 11 and r2["active_buckets"] == 2
    # mu = 20/11; var = (100+100)/11 - mu^2; fano = var/mu
    mu = 20 / 11
    var = 200 / 11 - mu * mu
    assert abs(r2["fano"] - var / mu) < 1e-6


def test_fano_single_bucket_null(spark):
    df = spark.createDataFrame([(1, "2024-01-01 00:10:00"),
                                (1, "2024-01-01 00:50:00")],
                               "user_id int, ts string")
    r = fano_factor(df, "user_id", "ts", 3600).collect()[0]
    assert r["span_buckets"] == 1 and r["fano"] is None


def test_funnel_latency_hand_computed(spark):
    rows = [
        # u1: view at t0, purchase 2h later, second purchase later
        (1, "view", "2024-01-01 00:00:00"),
        (1, "purchase", "2024-01-01 02:00:00"),
        (1, "purchase", "2024-01-01 09:00:00"),
        # u2: purchase BEFORE first view (ignored), none after -> no conv
        (2, "purchase", "2024-01-01 00:00:00"),
        (2, "view", "2024-01-01 01:00:00"),
        # u3: view, converts 4h later
        (3, "view", "2024-01-01 00:00:00"),
        (3, "purchase", "2024-01-01 04:00:00"),
        # u4: only purchase, never viewed -> not started
        (4, "purchase", "2024-01-01 00:00:00"),
    ]
    df = spark.createDataFrame(rows, "user_id int, event_type string, ts string")
    r = funnel_latency(df, "user_id", "event_type", "ts",
                       "view", "purchase").collect()[0]
    assert r["n_started"] == 3 and r["n_converted"] == 2
    assert abs(r["conv_rate"] - 2 / 3) < 1e-9
    # latencies: 2h and 4h
    assert abs(r["mean_hours"] - 3.0) < 1e-9
    assert abs(r["p50_hours"] - 3.0) < 1e-9   # interpolated midpoint
    assert abs(r["p90_hours"] - 3.8) < 1e-9


def test_peak_concurrency_hand_computed(spark):
    from feathr_spark.operators.sessions import peak_concurrency
    rows = [
        # three users whose sessions overlap pairwise within one day
        (1, "2024-01-01 10:00:00"), (1, "2024-01-01 10:10:00"),
        (2, "2024-01-01 10:05:00"), (2, "2024-01-01 10:20:00"),
        (3, "2024-01-01 10:15:00"),
        # user 1 gets a SECOND session later the same day
        (1, "2024-01-01 18:00:00"),
        # next day: one lone session
        (2, "2024-01-02 09:00:00"),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts string")
    out = {r["day"]: r for r in
           peak_concurrency(df, "user_id", "ts", gap="30m").collect()}
    d1 = out["2024-01-01"]
    # sessions day1: u1[10:00-10:10], u2[10:05-10:20], u3[10:15],
    # u1[18:00]; peak = 2 (u1+u2 overlap; u3 starts at u2's range too:
    # at 10:15 u2 active + u3 -> also 2 after u1 ended at 10:10)
    assert d1["n_sessions_started"] == 4
    assert d1["peak_concurrency"] == 2
    assert out["2024-01-02"]["peak_concurrency"] == 1


def test_peak_concurrency_midnight_carry(spark):
    from feathr_spark.operators.sessions import peak_concurrency
    rows = [
        # session spanning midnight: events 23:50 and 00:05 (15m gap)
        (1, "2024-01-01 23:50:00"), (1, "2024-01-02 00:05:00"),
        # a second user active only on day 2 at 00:03
        (2, "2024-01-02 00:03:00"),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts string")
    out = {r["day"]: r for r in
           peak_concurrency(df, "user_id", "ts", gap="30m").collect()}
    # day 2 peak must count user 1's still-open session (carry = 1)
    assert out["2024-01-02"]["peak_concurrency"] == 2
    assert out["2024-01-01"]["peak_concurrency"] == 1
    assert out["2024-01-02"]["n_sessions_started"] == 1
