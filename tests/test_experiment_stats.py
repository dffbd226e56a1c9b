"""Experimentation-statistics operators: CUPED, two-proportion z + SRM,
delta-method ratio CI.

Each test pins the full output row against a pure-Python/numpy
recomputation on a hand-built frame — the same verification style as
ab_welch/roc_auc (tests/test_rank_tests.py): the operator's distributed
decimal-moment algebra must land on the textbook scalar result.
"""

import math

import pytest

from feathr_spark.operators.stats import (
    cuped_adjust,
    delta_ratio_ci,
    two_proportion_ztest,
)


def _py_moments(rows):
    n = len(rows)
    my = sum(r[0] for r in rows) / n
    mx = sum(r[1] for r in rows) / n
    vy = sum((r[0] - my) ** 2 for r in rows) / (n - 1)
    vx = sum((r[1] - mx) ** 2 for r in rows) / (n - 1)
    cxy = sum((r[0] - my) * (r[1] - mx) for r in rows) / (n - 1)
    return n, my, mx, vy, vx, cxy


def test_cuped_matches_pure_python(spark):
    # y correlated with x plus an arm effect: CUPED must shrink variance
    rows = []
    for i in range(40):
        x = float((i * 7) % 13)
        arm = "t" if i % 2 else "c"
        y = 2.0 * x + (1.5 if arm == "t" else 0.0) + float((i * 3) % 5)
        rows.append((arm, y, x))
    df = spark.createDataFrame(rows, ["g", "y", "x"])
    out = cuped_adjust(df, "g", "y", "x", "c", "t").collect()[0]

    np_, myp, mxp, vyp, vxp, cxyp = _py_moments([(y, x) for _, y, x in rows])
    theta = cxyp / vxp
    cs = [(y, x) for g, y, x in rows if g == "c"]
    ts = [(y, x) for g, y, x in rows if g == "t"]
    nc, myc, mxc, vyc, vxc, cxyc = _py_moments(cs)
    nt, myt, mxt, vyt, vxt, cxyt = _py_moments(ts)
    adj_c = myc - theta * (mxc - mxp)
    adj_t = myt - theta * (mxt - mxp)
    av_c = vyc - 2 * theta * cxyc + theta * theta * vxc
    av_t = vyt - 2 * theta * cxyt + theta * theta * vxt
    z = (adj_t - adj_c) / math.sqrt(av_c / nc + av_t / nt)
    avp = vyp - 2 * theta * cxyp + theta * theta * vxp

    assert out["n_control"] == nc and out["n_treatment"] == nt
    assert out["theta"] == pytest.approx(theta, abs=1e-6)
    assert out["adj_mean_control"] == pytest.approx(adj_c, abs=1e-6)
    assert out["adj_mean_treatment"] == pytest.approx(adj_t, abs=1e-6)
    assert out["adj_diff"] == pytest.approx(adj_t - adj_c, abs=1e-6)
    assert out["z_stat"] == pytest.approx(z, abs=1e-6)
    assert out["var_reduction"] == pytest.approx(1 - avp / vyp, abs=1e-6)
    # the whole point: correlated covariate removes most of the noise
    assert out["var_reduction"] > 0.5


def test_cuped_constant_covariate_degrades_to_unadjusted(spark):
    rows = [("c", 1.0, 5.0), ("c", 3.0, 5.0), ("t", 2.0, 5.0),
            ("t", 6.0, 5.0)]
    df = spark.createDataFrame(rows, ["g", "y", "x"])
    out = cuped_adjust(df, "g", "y", "x", "c", "t").collect()[0]
    assert out["theta"] == 0.0
    assert out["adj_mean_control"] == pytest.approx(2.0)
    assert out["adj_mean_treatment"] == pytest.approx(4.0)
    assert out["var_reduction"] == pytest.approx(0.0)


def test_two_proportion_ztest_matches_formula(spark):
    # 30 control (12 successes), 50 treatment (35 successes)
    rows = [("c", 1 if i < 12 else 0) for i in range(30)]
    rows += [("t", 1 if i < 35 else 0) for i in range(50)]
    df = spark.createDataFrame(rows, ["g", "s"])
    out = two_proportion_ztest(df, "g", "s", "c", "t").collect()[0]
    pc, pt = 12 / 30, 35 / 50
    pool = 47 / 80
    z = (pt - pc) / math.sqrt(pool * (1 - pool) * (1 / 30 + 1 / 50))
    exp = 80 * 0.5
    srm = (30 - exp) ** 2 / exp + (50 - exp) ** 2 / exp
    assert out["n_control"] == 30 and out["n_treatment"] == 50
    assert out["successes_control"] == 12
    assert out["successes_treatment"] == 35
    assert out["p_diff"] == pytest.approx(pt - pc, abs=1e-9)
    assert out["z_stat"] == pytest.approx(z, abs=1e-9)
    assert out["srm_chi2"] == pytest.approx(srm, abs=1e-9)


def test_two_proportion_ztest_respects_expected_ratio(spark):
    # a genuine 3:1 treatment allocation must show NO mismatch at 3.0
    rows = [("c", 0)] * 25 + [("t", 1)] * 75
    df = spark.createDataFrame(rows, ["g", "s"])
    out = two_proportion_ztest(df, "g", "s", "c", "t",
                               expected_ratio=3.0).collect()[0]
    assert out["srm_chi2"] == pytest.approx(0.0, abs=1e-9)
    out2 = two_proportion_ztest(df, "g", "s", "c", "t").collect()[0]
    assert out2["srm_chi2"] > 3.84  # flagged under the 1:1 assumption


def test_delta_ratio_ci_matches_pure_python(spark):
    # unit-clustered rows: some users contribute many rows, ratio metric
    # = value per row; delta method over PER-UNIT sums
    rows = []
    for u in range(12):
        arm = "t" if u % 2 else "c"
        for j in range((u % 4) + 1):
            rows.append((arm, u, 1.0 + 0.25 * ((u * 5 + j) % 7)))
    df = spark.createDataFrame(rows, ["g", "u", "val"])
    from pyspark.sql import functions as F
    df = df.withColumn("one", F.lit(1.0))
    out = delta_ratio_ci(df, "u", "g", "val", "one", "c", "t").collect()[0]

    def arm_stats(arm):
        per = {}
        for g, u, v in rows:
            if g == arm:
                n, d = per.get(u, (0.0, 0.0))
                per[u] = (n + v, d + 1.0)
        units = list(per.values())
        m = len(units)
        sn = sum(n for n, _ in units)
        sd = sum(d for _, d in units)
        r = sn / sd
        mn, md = sn / m, sd / m
        vn = sum((n - mn) ** 2 for n, _ in units) / (m - 1)
        vd = sum((d - md) ** 2 for _, d in units) / (m - 1)
        cnd = sum((n - mn) * (d - md) for n, d in units) / (m - 1)
        var_r = (vn - 2 * r * cnd + r * r * vd) / (m * md * md)
        return m, r, math.sqrt(var_r)

    mc, rc, sec = arm_stats("c")
    mt, rt, set_ = arm_stats("t")
    z = (rt - rc) / math.sqrt(sec ** 2 + set_ ** 2)
    assert out["units_control"] == mc and out["units_treatment"] == mt
    assert out["ratio_control"] == pytest.approx(rc, abs=1e-6)
    assert out["ratio_treatment"] == pytest.approx(rt, abs=1e-6)
    assert out["se_control"] == pytest.approx(sec, abs=1e-6)
    assert out["se_treatment"] == pytest.approx(set_, abs=1e-6)
    assert out["z_stat"] == pytest.approx(z, abs=1e-6)


def test_delta_ratio_ci_single_scan_plan(spark):
    """The unit collapse must be the ONLY data-sized shuffle: one
    groupBy(group, unit) Exchange + the 1-row global fold."""
    rows = [("c", u % 5, float(u)) for u in range(20)]
    df = spark.createDataFrame(rows + [("t", 9, 1.0)], ["g", "u", "val"])
    from pyspark.sql import functions as F
    df = df.withColumn("one", F.lit(1.0))
    out = delta_ratio_ci(df, "u", "g", "val", "one", "c", "t")
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re
    assert len(re.findall(r"\bExchange\b", plan)) <= 2, plan
