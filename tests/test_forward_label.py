"""forward_label: leakage-safe future-window label generation with
watermark right-censoring."""

import pytest
from pyspark.sql import functions as F

from feathr_spark.operators.sampling import forward_label


def _ev(spark, rows):
    df = spark.createDataFrame(rows, "event_id bigint, user_id bigint, "
                                     "ts string")
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def test_forward_label_within_and_beyond_horizon(spark):
    rows = [
        (1, 1, "2024-01-01 00:00:00"),   # next in 2 days -> True
        (2, 1, "2024-01-03 00:00:00"),   # next in 10 days -> False
        (3, 1, "2024-01-13 00:00:00"),   # next in 1 day -> True
        (4, 1, "2024-01-14 00:00:00"),   # censored (last obs window)
        (5, 2, "2024-01-01 00:00:00"),   # no future event, observable
    ]
    out = {r["event_id"]: r for r in
           forward_label(_ev(spark, rows), ["user_id"], "ts",
                         horizon_s=7 * 86400).collect()}
    assert out[1]["label"] is True and out[1]["observable"]
    assert out[2]["label"] is False
    # event 3 is censored (window truncated) but its positive outcome
    # was OBSERVED -> known TRUE
    assert out[3]["label"] is True and out[3]["observable"] is False
    # event 4: censored with no in-horizon event -> NULL, never a fake
    # negative
    assert out[4]["observable"] is False and out[4]["label"] is None
    # event 5: observable, no next event -> a real negative
    assert out[5]["label"] is False and out[5]["observable"]


def test_forward_label_never_looks_backward(spark):
    # user 1 has a PAST event 1 minute before; the label must ignore it
    rows = [(1, 1, "2024-01-01 00:00:00"),
            (2, 1, "2024-01-01 00:01:00"),
            (3, 9, "2024-03-01 00:00:00")]   # pushes the watermark out
    out = {r["event_id"]: r for r in
           forward_label(_ev(spark, rows), ["user_id"], "ts",
                         horizon_s=3600).collect()}
    assert out[1]["label"] is True       # forward to event 2
    assert out[2]["label"] is False      # nothing after it


def test_forward_label_gap_is_exact_millis(spark):
    rows = [(1, 1, "2024-01-01 00:00:00"), (2, 1, "2024-01-01 00:00:01"),
            (3, 9, "2024-06-01 00:00:00")]
    out = {r["event_id"]: r for r in
           forward_label(_ev(spark, rows), ["user_id"], "ts",
                         horizon_s=60).collect()}
    assert out[1]["gap_ms"] == 1000
    assert out[2]["gap_ms"] is None


def test_forward_label_keys_isolate_users(spark):
    rows = [(1, 1, "2024-01-01 00:00:00"), (2, 2, "2024-01-01 00:30:00"),
            (3, 9, "2024-06-01 00:00:00")]
    out = {r["event_id"]: r for r in
           forward_label(_ev(spark, rows), ["user_id"], "ts",
                         horizon_s=3600).collect()}
    # user 2's event must not satisfy user 1's window
    assert out[1]["label"] is False


def test_forward_label_partitioning_invariance(spark):
    rows = [(i, i % 5, f"2024-01-{(i % 27) + 1:02d} 00:00:00")
            for i in range(200)]
    df = _ev(spark, rows)
    a = sorted(map(tuple, forward_label(df, ["user_id"], "ts",
                                        horizon_s=86400).collect()))
    b = sorted(map(tuple, forward_label(df.repartition(13), ["user_id"],
                                        "ts", horizon_s=86400).collect()))
    assert a == b
