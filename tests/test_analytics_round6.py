"""Value tests for the round-6 third batch: triangle counting,
Kaplan-Meier survival, conversion attribution, cohort LTV."""
import itertools
import random

import pytest
from pyspark.sql import Row

from feathr_spark.operators.attribution import attribution_credits
from feathr_spark.operators.funnel import ltv_cohorts
from feathr_spark.operators.graph import triangle_stats
from feathr_spark.operators.survival import (
    kaplan_meier, order_gap_durations)


# ---------------------------------------------------------------- triangles

def _brute_triangles(edges):
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = {v: 0 for v in adj}
    for u, v, w in itertools.combinations(sorted(adj), 3):
        if v in adj[u] and w in adj[u] and w in adj[v]:
            tri[u] += 1
            tri[v] += 1
            tri[w] += 1
    return adj, tri


def test_triangle_stats_hand_graph(spark):
    # K4 plus a pendant: every K4 node is in C(3,2)=3 triangles
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)]
    df = spark.createDataFrame(edges, "src int, dst int")
    out = {r.id: r for r in triangle_stats(df).collect()}
    assert {v: out[v].triangles for v in out} == \
        {1: 3, 2: 3, 3: 3, 4: 3, 5: 0}
    assert out[1].clustering_coeff == 1.0          # K4 members: all pairs
    assert out[4].degree == 4 and abs(
        out[4].clustering_coeff - 0.5) < 1e-12     # 3 of 6 pairs closed
    assert out[5].clustering_coeff is None         # degree < 2


def test_triangle_stats_random_matches_brute_force(spark):
    rng = random.Random(7)
    edges = list({(rng.randint(0, 25), rng.randint(0, 25))
                  for _ in range(140)})
    # throw in duplicates + reversed duplicates + self loops
    noisy = edges + [(b, a) for a, b in edges[:30]] + [(3, 3), (9, 9)]
    adj, tri = _brute_triangles(edges)
    df = spark.createDataFrame(noisy, "src int, dst int")
    out = {r.id: r for r in triangle_stats(df).collect()}
    assert set(out) == set(adj)
    for v in adj:
        assert out[v].triangles == tri[v], v
        assert out[v].degree == len(adj[v]), v
        d = len(adj[v])
        if d >= 2:
            assert abs(out[v].clustering_coeff
                       - 2.0 * tri[v] / (d * (d - 1))) < 1e-12


# ------------------------------------------------------------ kaplan-meier

def test_kaplan_meier_textbook_example(spark):
    # classic: events at 6,6,6 censored 6+, events 7, 10, censored 9+,10+
    rows = [(6, 1), (6, 1), (6, 1), (6, 0), (7, 1), (9, 0),
            (10, 1), (10, 0)]
    df = spark.createDataFrame(rows, "duration int, event int")
    out = {r.duration: r for r in kaplan_meier(df).collect()}
    # t=6: n=8, d=3 -> S = 5/8
    assert out[6].n_risk == 8 and out[6].n_event == 3 \
        and out[6].n_censored == 1
    assert abs(out[6].survival - 5 / 8) < 1e-12
    # t=7: n=4, d=1 -> S = 5/8 * 3/4
    assert out[7].n_risk == 4
    assert abs(out[7].survival - 5 / 8 * 3 / 4) < 1e-12
    # t=10: n=2, d=1 -> S halves
    assert abs(out[10].survival - 5 / 8 * 3 / 4 * 1 / 2) < 1e-12
    # censored-only time keeps the curve flat
    assert abs(out[9].survival - out[7].survival) < 1e-12


def test_kaplan_meier_zero_factor_and_keys(spark):
    rows = [("a", 1, 1), ("a", 2, 1), ("b", 1, 1), ("b", 1, 1)]
    df = spark.createDataFrame(rows, "g string, duration int, event int")
    out = {(r.g, r.duration): r
           for r in kaplan_meier(df, key_cols=["g"]).collect()}
    # group b: everyone exits at t=1 -> survival exactly 0, not NULL
    assert out[("b", 1)].survival == 0.0
    assert abs(out[("a", 1)].survival - 0.5) < 1e-12
    assert out[("a", 2)].survival == 0.0


def test_order_gap_durations_censoring(spark):
    rows = [(1, "2024-01-01"), (1, "2024-01-11"), (2, "2024-01-05")]
    df = spark.createDataFrame(rows, "u int, d string") \
        .selectExpr("u", "cast(d as timestamp) as ts")
    out = sorted((r.user, r.duration, r.event)
                 for r in order_gap_durations(df, "u", "ts").collect())
    # horizon = 2024-01-11 (global max): user1 gap 10 observed then 0
    # censored at horizon; user2 6-day censored gap
    assert out == [(1, 0, False), (1, 10, True), (2, 6, False)]


# ------------------------------------------------------------- attribution

def test_attribution_credits_hand_log(spark):
    rows = [
        # user 1: view(t1) click(t2) purchase(t3) view(t4, after conv)
        (1, 1, "view", 1000), (2, 1, "click", 2000),
        (3, 1, "purchase", 3000), (4, 1, "view", 4000),
        # user 2: click click view purchase -> first=click last=view
        (5, 2, "click", 1000), (6, 2, "click", 2000),
        (7, 2, "view", 3000), (8, 2, "purchase", 4000),
        # user 3: purchase with no prior touches -> no credit
        (9, 3, "purchase", 1000),
        # user 4: touches but no conversion -> no credit
        (10, 4, "view", 1000),
    ]
    df = spark.createDataFrame(
        [Row(event_id=i, user_id=u, event_type=t,
             ts=f"2024-01-01 00:00:{ms // 1000:02d}")
         for i, u, t, ms in rows]) \
        .selectExpr("event_id", "user_id", "event_type",
                    "cast(ts as timestamp) as ts")
    out = {r.channel: r for r in attribution_credits(
        df, "purchase").collect()}
    assert set(out) == {"view", "click"}
    assert out["view"].first_touch == 1      # user 1
    assert out["click"].first_touch == 1     # user 2
    assert out["view"].last_touch == 1       # user 2
    assert out["click"].last_touch == 1      # user 1
    # linear: user1 -> view .5 click .5 ; user2 -> click 2/3 view 1/3
    assert abs(out["view"].linear - (0.5 + 1 / 3)) < 1e-12
    assert abs(out["click"].linear - (0.5 + 2 / 3)) < 1e-12
    assert out["view"].n_touches == 2 and out["click"].n_touches == 3
    # credit mass conservation: each model totals the attributed users
    for col in ("first_touch", "last_touch", "linear"):
        assert abs(sum(getattr(r, col) for r in out.values()) - 2) < 1e-12


def test_attribution_lookback_window(spark):
    df = spark.createDataFrame([
        Row(event_id=1, user_id=1, event_type="view",
            ts="2024-01-01 00:00:00"),
        Row(event_id=2, user_id=1, event_type="click",
            ts="2024-01-03 00:00:00"),
        Row(event_id=3, user_id=1, event_type="purchase",
            ts="2024-01-03 12:00:00"),
    ]).selectExpr("event_id", "user_id", "event_type",
                  "cast(ts as timestamp) as ts")
    out = {r.channel: r for r in attribution_credits(
        df, "purchase", lookback="1d").collect()}
    assert set(out) == {"click"}   # the view fell outside the 1d window
    assert out["click"].linear == 1.0


# -------------------------------------------------------------- LTV cohort

def test_ltv_cohorts_hand_triangle(spark):
    rows = [
        (1, "2024-01-05", 10.0), (1, "2024-02-01", 20.0),
        (2, "2024-01-20", 5.0),
        (3, "2024-02-10", 7.0), (3, "2024-02-20", 3.0),
    ]
    df = spark.createDataFrame(rows, "u int, d string, amt double") \
        .selectExpr("u", "cast(d as timestamp) as ts", "amt")
    out = {(str(r.cohort_month), r.month_offset): r
           for r in ltv_cohorts(df, "u", "ts", "amt").collect()}
    jan0 = out[("2024-01-01", 0)]
    assert jan0.cohort_users == 2 and jan0.revenue == 15.0
    assert abs(jan0.cum_ltv_per_user - 7.5) < 1e-12
    jan1 = out[("2024-01-01", 1)]
    assert jan1.revenue == 20.0 and jan1.cohort_users == 2
    assert abs(jan1.cum_ltv_per_user - 17.5) < 1e-12
    feb0 = out[("2024-02-01", 0)]
    assert feb0.cohort_users == 1 and feb0.revenue == 10.0
    assert abs(feb0.cum_ltv_per_user - 10.0) < 1e-12
    assert len(out) == 3


# ------------------------------------------------------- connected components

def _brute_components(edges, nodes=None):
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for n in nodes or ():
        adj.setdefault(n, set())
    comp = {}
    for start in sorted(adj):
        if start in comp:
            continue
        stack, members = [start], []
        seen = {start}
        while stack:
            u = stack.pop()
            members.append(u)
            for v in adj[u]:
                if v not in seen:
                    seen.add(v)
                    stack.append(v)
        root = min(members)
        for m in members:
            comp[m] = root
    return comp


def test_connected_components_long_chain(spark):
    # a 60-node path — the diameter case min-label propagation is
    # quadratic-round on; large-star/small-star must converge fast
    from feathr_spark.operators.graph import connected_components
    edges = [(i, i + 1) for i in range(60)] + [(100, 101), (200, 200)]
    df = spark.createDataFrame(edges, "src int, dst int")
    out = {r.id: (r.component, r.component_size)
           for r in connected_components(df, max_iters=12).collect()}
    assert all(out[i] == (0, 61) for i in range(61))
    assert out[100] == (100, 2) and out[101] == (100, 2)
    assert 200 not in out  # pure self-loop node is dropped


def test_connected_components_random_matches_brute_force(spark):
    from feathr_spark.operators.graph import connected_components
    rng = random.Random(13)
    edges = list({(rng.randint(0, 80), rng.randint(0, 80))
                  for _ in range(70)})
    df = spark.createDataFrame(edges + [(b, a) for a, b in edges[:10]],
                               "src int, dst int")
    want = _brute_components(edges)
    out = {r.id: r.component for r in connected_components(df).collect()}
    assert out == {k: v for k, v in want.items()}


# ---------------------------------------------------------------- log-rank

def test_logrank_identical_groups_zero_chi2(spark):
    from feathr_spark.operators.survival import logrank_test
    rows = [(d, e) for d in (1, 2, 3, 5, 8) for e in (True, False)]
    data = [("a", d, e) for d, e in rows] + [("b", d, e) for d, e in rows]
    df = spark.createDataFrame(data, "group string, duration int, event boolean")
    r = logrank_test(df).collect()[0]
    assert r.group_a == "a" and r.group_b == "b"
    assert r.obs_a == r.obs_b == 5
    assert abs(r.chi2) < 1e-12
    assert abs(r.exp_a - r.obs_a) < 1e-9


def test_logrank_textbook_example(spark):
    # Worked example: group A events at 1,2 (n=3, one censored at 3);
    # group B events at 3,4 (n=3, one censored at 5).
    from feathr_spark.operators.survival import logrank_test
    data = [("A", 1, True), ("A", 2, True), ("A", 3, False),
            ("B", 3, True), ("B", 4, True), ("B", 5, False)]
    df = spark.createDataFrame(data, "group string, duration int, event boolean")
    r = logrank_test(df).collect()[0]
    # hand computation:
    # t=1: d=1 nA=3 nB=3 -> eA=.5, v=.25
    # t=2: d=1 nA=2 nB=3 -> eA=.4, v=.24
    # t=3: d=1 nA=1 nB=3 -> eA=.25, v=.1875
    # t=4: d=1 nA=0 nB=2 -> eA=0,  v=0
    assert r.obs_a == 2 and r.obs_b == 2
    assert abs(r.exp_a - 1.15) < 1e-9
    assert abs(r.exp_b - 2.85) < 1e-9
    chi2 = (2 - 1.15) ** 2 / (0.25 + 0.24 + 0.1875)
    assert abs(r.chi2 - chi2) < 1e-9


# ---------------------------------------------------------------- spearman

def test_spearman_exact_monotone_and_ties(spark):
    from feathr_spark.operators.stats import spearman_corr
    # y is a monotone (nonlinear) function of x -> rho exactly 1
    rows = [(float(x), float(x ** 3)) for x in range(1, 9)]
    df = spark.createDataFrame(rows, "x double, y double")
    r = spearman_corr(df, [("x", "y")]).collect()[0]
    assert abs(r.rho_x__y - 1.0) < 1e-12
    # reversed -> -1
    rows = [(float(x), float(-x ** 3)) for x in range(1, 9)]
    r = spearman_corr(spark.createDataFrame(rows, "x double, y double"),
                      [("x", "y")]).collect()[0]
    assert abs(r.rho_x__y + 1.0) < 1e-12


def test_spearman_ties_match_scipy_convention(spark):
    from feathr_spark.operators.stats import spearman_corr
    # hand-checked with average ranks:
    # x = [1,2,2,3], ranks [1, 2.5, 2.5, 4]
    # y = [10,20,20,10], ranks [1.5, 3.5, 3.5, 1.5]
    # pearson(rx, ry) = 0 by symmetry? compute: rx dev [-1.5,0,0,1.5],
    # ry dev [-1,1,1,-1] -> cov = (1.5 - 1.5)/3 = 0
    rows = [(1.0, 10.0), (2.0, 20.0), (2.0, 20.0), (3.0, 10.0)]
    df = spark.createDataFrame(rows, "x double, y double")
    r = spearman_corr(df, [("x", "y")]).collect()[0]
    assert abs(r.rho_x__y) < 1e-12
    assert r.n == 4


# ---------------------------------------------------------------- acf

def test_autocorrelation_alternating_series(spark):
    from feathr_spark.operators.timeseries import autocorrelation
    # x alternates around its mean: acf(1) strongly negative, acf(2)
    # positive; exact values from the biased estimator
    xs = [1.0, -1.0] * 6
    rows = [(i, x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "t int, x double")
    out = {r.lag: r for r in
           autocorrelation(df, "t", "x", max_lag=3).collect()}
    n = len(xs)
    mu = sum(xs) / n
    ss = sum((v - mu) ** 2 for v in xs)
    for k in (1, 2, 3):
        want = sum((xs[i] - mu) * (xs[i - k] - mu)
                   for i in range(k, n)) / ss
        assert abs(out[k].acf - round(want + 1e-9, 4)) < 1e-9, k
        assert out[k].n_pairs == n - k


def test_autocorrelation_keyed_constant_null(spark):
    from feathr_spark.operators.timeseries import autocorrelation
    rows = [("a", i, float(i % 4)) for i in range(12)] + \
           [("b", i, 5.0) for i in range(6)]
    df = spark.createDataFrame(rows, "k string, t int, x double")
    out = {(r.k, r.lag): r.acf for r in
           autocorrelation(df, "t", "x", max_lag=2, by=["k"]).collect()}
    assert out[("b", 1)] is None and out[("b", 2)] is None
    assert out[("a", 1)] is not None
