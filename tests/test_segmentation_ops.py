"""Value tests for the round-6 segmentation/uplift/cadence operators:
qini_uplift, abc_xyz, interarrival_stats — constructed inputs with
hand-computed expected outputs (not just shape checks)."""
import math

import pytest
from pyspark.sql import functions as F

from feathr_spark.operators.olap import abc_xyz
from feathr_spark.operators.sessions import interarrival_stats
from feathr_spark.operators.stats import qini_uplift


def test_qini_perfect_targeting(spark):
    """Scores that perfectly separate responders: treated responders all
    sit in the top bucket, so the top-depth qini equals the full
    incremental response and stays flat below it."""
    # 40 rows, scores 0..39; outcome=1 iff treated AND score >= 30
    rows = [(float(s), 1 if s % 2 == 0 else 0,
             1 if (s % 2 == 0 and s >= 30) else 0)
            for s in range(40)]
    df = spark.createDataFrame(rows, "score double, treat int, outcome int")
    out = qini_uplift(df, "treat", "outcome", "score", buckets=4)
    rows = {r["bucket"]: r for r in out.collect()}
    assert set(rows) == {0, 1, 2, 3}
    top = rows[3]
    # top bucket: scores 30..39 -> 5 treated (all respond), 5 control
    assert top["n_treat"] == 5 and top["n_ctrl"] == 5
    assert top["resp_treat"] == 5.0 and top["resp_ctrl"] == 0.0
    # qini at depth 1 bucket: (5/5 - 0/5) * 10 = 10
    assert abs(top["qini"] - 10.0) < 1e-9
    # full depth: (5/20 - 0/20) * 40 = 10 — no further incremental lift
    assert abs(rows[0]["qini"] - 10.0) < 1e-9
    assert rows[0]["cum_n"] == 40


def test_qini_selection_mode_equals_buffer(spark):
    """percentile_mode='selection' (the 10^9-unit global-cuts path) must
    reproduce the buffer plan's output exactly — the cuts are
    bit-identical by the selection_percentiles contract, so every
    bucket assignment and cumulative stat matches."""
    rows = [(float((s * 37) % 101) + (0.5 if s % 3 == 0 else 0.0),
             s % 2, 1 if (s % 5 == 0 and s % 2 == 0) else 0)
            for s in range(200)]
    df = spark.createDataFrame(rows, "score double, treat int, outcome int")
    a = sorted(qini_uplift(df, "treat", "outcome", "score",
                           buckets=5).collect())
    b = sorted(qini_uplift(df, "treat", "outcome", "score", buckets=5,
                           percentile_mode="selection").collect())
    assert a == b
    with pytest.raises(ValueError):
        qini_uplift(df, "treat", "outcome", "score",
                    percentile_mode="selektion").collect()


def test_qini_null_when_arm_empty(spark):
    df = spark.createDataFrame(
        [(1.0, 1, 1), (2.0, 1, 0), (3.0, 1, 1), (4.0, 1, 0)],
        "score double, treat int, outcome int")
    out = qini_uplift(df, "treat", "outcome", "score", buckets=2)
    for r in out.collect():
        assert r["qini"] is None and r["uplift_rate"] is None


def test_abc_xyz_classes(spark):
    """Three keys: one dominant steady seller (A/X), one mid erratic
    (B or C by share / Z by cv), one tail constant (C/X)."""
    rows = []
    # key 1: 80 per period x 10 periods = 800 (steady)
    rows += [(1, p, 80.0) for p in range(10)]
    # key 2: alternating 0.5 / 29.5 x 10 periods = 150 (erratic)
    rows += [(2, p, 0.5 if p % 2 == 0 else 29.5) for p in range(10)]
    # key 3: 5 per period x 10 periods = 50 (steady tail)
    rows += [(3, p, 5.0) for p in range(10)]
    df = spark.createDataFrame(rows, "k int, p int, v double")
    out = {r["k"]: r for r in abc_xyz(df, "k", "v", "p").collect()}
    # shares: 800/1000=0.8 (A), +150 -> 0.95 (B), +50 -> 1.0 (C)
    assert out[1]["abc"] == "A" and out[2]["abc"] == "B" \
        and out[3]["abc"] == "C"
    assert out[1]["xyz"] == "X" and out[3]["xyz"] == "X"
    # key 2 cv: mean 15, sample sd of alternating +/-14.5 ~= 15.28 -> Z
    assert out[2]["xyz"] == "Z"
    assert out[1]["n_periods"] == 10
    assert abs(out[1]["share_cum"] - 0.8) < 1e-6
    mean2, sd2 = 15.0, math.sqrt(sum((x - 15.0) ** 2 for x in
                                     [0.5, 29.5] * 5) / 9)
    assert abs(out[2]["cv"] - sd2 / mean2) < 1e-4


def test_abc_ties_share_class(spark):
    """Keys with EQUAL totals must land in the same ABC class at any
    parallelism (all-ties-inclusive cumulative share)."""
    rows = [(k, 0, 10.0) for k in range(10)]
    df = spark.createDataFrame(rows, "k int, p int, v double")
    out = abc_xyz(df, "k", "v", "p").collect()
    assert len({r["abc"] for r in out}) == 1
    assert all(abs(r["share_cum"] - 1.0) < 1e-9 for r in out)


def test_interarrival_gaps(spark):
    df = spark.createDataFrame(
        [(1, "2024-01-01"), (1, "2024-01-03"), (1, "2024-01-10"),
         (2, "2024-01-05"),
         (3, "2024-02-01"), (3, "2024-02-02")],
        "k int, ts string")
    out = {r["k"]: r for r in
           interarrival_stats(df, "k", "ts").collect()}
    # key 2 has a single event -> no gaps -> excluded
    assert set(out) == {1, 3}
    r1 = out[1]
    assert r1["n_events"] == 3
    assert abs(r1["span"] - 9.0) < 1e-9
    assert abs(r1["avg_gap"] - 4.5) < 1e-9
    assert abs(r1["min_gap"] - 2.0) < 1e-9
    assert abs(r1["max_gap"] - 7.0) < 1e-9
    assert out[3]["n_events"] == 2 and abs(out[3]["avg_gap"] - 1.0) < 1e-9


def test_interarrival_tie_break_deterministic(spark):
    """Equal timestamps: the tie column fixes lag order, so gaps are
    stable (0-gap between the tied rows regardless of input order)."""
    rows = [(1, "2024-01-01", 2), (1, "2024-01-01", 1), (1, "2024-01-04", 3)]
    for perm in (rows, rows[::-1]):
        df = spark.createDataFrame(perm, "k int, ts string, oid int")
        r = interarrival_stats(df, "k", "ts", tie_col="oid").collect()[0]
        assert r["n_events"] == 3
        assert abs(r["min_gap"] - 0.0) < 1e-9
        assert abs(r["max_gap"] - 3.0) < 1e-9


def test_woe_encode_hand_computed(spark):
    from feathr_spark.operators.encoding import woe_encode
    # cat A: 3 pos 1 neg; cat B: 1 pos 3 neg; totals 4 pos 4 neg
    rows = [("A", 1)] * 3 + [("A", 0)] + [("B", 1)] + [("B", 0)] * 3
    df = spark.createDataFrame(rows, "c string, y int")
    out = {r["category"]: r for r in woe_encode(df, "c", "y").collect()}
    a = out["A"]
    assert a["n"] == 4 and a["n_pos"] == 3 and a["n_neg"] == 1
    assert abs(a["pos_frac"] - 0.75) < 1e-9
    assert abs(a["neg_frac"] - 0.25) < 1e-9
    assert abs(a["woe"] - math.log(3.0)) < 1e-9
    assert abs(a["iv_term"] - 0.5 * math.log(3.0)) < 1e-9
    assert abs(out["B"]["woe"] + math.log(3.0)) < 1e-9


def test_woe_single_sided_category_finite(spark):
    from feathr_spark.operators.encoding import woe_encode
    rows = [("A", 1)] * 5 + [("B", 0)] * 5
    df = spark.createDataFrame(rows, "c string, y int")
    out = {r["category"]: r for r in woe_encode(df, "c", "y").collect()}
    # zero cells floored at min_frac: finite, extreme-signed
    assert out["A"]["woe"] > 5 and out["B"]["woe"] < -5
    assert all(abs(r["woe"]) < 12 for r in out.values())


def test_hhi_monopoly_vs_uniform(spark):
    from feathr_spark.operators.olap import hhi
    rows = [(1, "only", 100.0)]
    rows += [(2, f"g{i}", 25.0) for i in range(4)]
    df = spark.createDataFrame(rows, "p int, g string, v double")
    out = {r["period"]: r for r in hhi(df, "g", "p", "v").collect()}
    assert abs(out[1]["hhi"] - 1.0) < 1e-6
    assert out[1]["n_groups"] == 1
    assert abs(out[2]["hhi"] - 0.25) < 1e-6


def test_lorenz_extremes(spark):
    from feathr_spark.operators.scaling import lorenz_curve
    # 10 keys, one holds all the value
    rows = [(k, 0.0001 if k else 1000.0) for k in range(10)]
    df = spark.createDataFrame(rows, "k int, v double")
    out = sorted(lorenz_curve(df, "k", "v", buckets=10).collect(),
                 key=lambda r: r["bucket"])
    # last point is always (1, 1)
    assert abs(out[-1]["cum_pop_frac"] - 1.0) < 1e-9
    assert abs(out[-1]["cum_value_frac"] - 1.0) < 1e-9
    # bottom ~90% of keys hold ~0 value
    assert out[0]["cum_value_frac"] < 0.01
    assert sum(r["n_keys"] for r in out) == 10


def test_woe_encode_one_class_corpus_yields_null_woe(spark):
    # zero positives overall: pos_frac/woe/iv_term must be NULL, not a
    # finite-looking min_frac-floored fit; counts stay exact
    from feathr_spark.operators.encoding import woe_encode
    df = spark.createDataFrame(
        [("a", 0), ("a", 0), ("b", 0)], "c string, y int")
    out = {r["category"]: r for r in woe_encode(df, "c", "y").collect()}
    assert out["a"]["n"] == 2 and out["a"]["n_pos"] == 0
    for r in out.values():
        assert r["pos_frac"] is None
        assert r["woe"] is None and r["iv_term"] is None
        assert r["neg_frac"] is not None  # negatives side is real
