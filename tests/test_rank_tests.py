"""Value tests for the rank-statistics batch: Mann-Whitney U,
Kruskal-Wallis H, Cramér's V, weighted percentiles."""
import math
import random

import pytest

from feathr_spark.operators.stats import (
    cramers_v, kruskal_wallis, mann_whitney_u, weighted_percentiles)


def _avg_ranks(values):
    s = sorted(values)
    pos = {}
    for i, v in enumerate(s, start=1):
        pos.setdefault(v, []).append(i)
    return {v: sum(ix) / len(ix) for v, ix in pos.items()}


def _mw_brute(a, b):
    ranks = _avg_ranks(a + b)
    ra = sum(ranks[v] for v in a)
    na, nb = len(a), len(b)
    ua = ra - na * (na + 1) / 2
    n = na + nb
    from collections import Counter
    tc = sum(t ** 3 - t for t in Counter(a + b).values())
    var = na * nb / 12 * ((n + 1) - tc / (n * (n - 1)))
    z = (ua - na * nb / 2) / math.sqrt(var) if var > 0 else None
    return ua, na * nb - ua, z


def test_mann_whitney_matches_brute_force(spark):
    rng = random.Random(5)
    a = [round(rng.gauss(0, 1), 1) for _ in range(60)]
    b = [round(rng.gauss(0.6, 1.2), 1) for _ in range(45)]
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "grp string, v double")
    r = mann_whitney_u(df, "grp", "v").collect()[0]
    ua, ub, z = _mw_brute(a, b)
    assert r.n_a == 60 and r.n_b == 45
    assert abs(r.u_a - ua) < 1e-6 and abs(r.u_b - ub) < 1e-6
    assert abs(r.z - z) < 1e-9


def test_mann_whitney_identical_groups(spark):
    rows = [("a", float(v)) for v in range(10)] + \
           [("b", float(v)) for v in range(10)]
    df = spark.createDataFrame(rows, "grp string, v double")
    r = mann_whitney_u(df, "grp", "v").collect()[0]
    assert abs(r.u_a - 50.0) < 1e-9       # na*nb/2: perfectly balanced
    assert abs(r.z) < 1e-12


def _kw_brute(groups):
    allv = [v for g in groups for v in g]
    ranks = _avg_ranks(allv)
    n = len(allv)
    sr = sum(sum(ranks[v] for v in g) ** 2 / len(g) for g in groups)
    h = 12 / (n * (n + 1)) * sr - 3 * (n + 1)
    from collections import Counter
    tc = sum(t ** 3 - t for t in Counter(allv).values())
    return h / (1 - tc / (n ** 3 - n))


def test_kruskal_wallis_matches_brute_force(spark):
    rng = random.Random(11)
    gs = [[round(rng.gauss(m, 1), 1) for _ in range(30 + 5 * i)]
          for i, m in enumerate((0.0, 0.4, 1.0))]
    rows = [(f"g{i}", v) for i, g in enumerate(gs) for v in g]
    df = spark.createDataFrame(rows, "grp string, v double")
    r = kruskal_wallis(df, "grp", "v").collect()[0]
    assert r.k == 3 and r.n == sum(len(g) for g in gs)
    assert abs(r.h - _kw_brute(gs)) < 1e-9


def test_kruskal_wallis_constant_values_null(spark):
    rows = [("a", 1.0)] * 5 + [("b", 1.0)] * 5
    df = spark.createDataFrame(rows, "grp string, v double")
    r = kruskal_wallis(df, "grp", "v").collect()[0]
    assert r.h is None


def test_cramers_v_perfect_and_independent(spark):
    # x==y -> V=1; z independent of x -> V~0 on a balanced table
    rows = [(str(i % 3), str(i % 3), str(i % 2)) for i in range(120)]
    df = spark.createDataFrame(rows, "x string, y string, z string")
    out = {(r.col_x, r.col_y): r
           for r in cramers_v(df, [("x", "y"), ("x", "z")]).collect()}
    assert abs(out[("x", "y")].v - 1.0) < 1e-9
    assert out[("x", "y")].dof == 4
    assert abs(out[("x", "z")].v) < 1e-9
    assert out[("x", "z")].chi2 == 0.0


def test_cramers_v_degenerate_single_level(spark):
    rows = [("a", "only")] * 7 + [("b", "only")] * 3
    df = spark.createDataFrame(rows, "x string, y string")
    r = cramers_v(df, [("x", "y")]).collect()[0]
    assert r.dof == 0 and r.v is None


def test_weighted_percentiles_hand_case(spark):
    # values 1..4 with weights 1,1,6,2 (total 10):
    # cum: 1->1, 2->2, 3->8, 4->10
    rows = [(1.0, 1.0), (2.0, 1.0), (3.0, 6.0), (4.0, 2.0)]
    df = spark.createDataFrame(rows, "v double, w double")
    out = {r.p: r.value for r in
           weighted_percentiles(df, "v", "w", [0.1, 0.2, 0.5, 0.8, 0.9,
                                               1.0]).collect()}
    assert out[0.1] == 1.0     # cum 1 >= 1
    assert out[0.2] == 2.0     # cum 2 >= 2
    assert out[0.5] == 3.0
    assert out[0.8] == 3.0     # cum 8 >= 8 exactly at the boundary
    assert out[0.9] == 4.0
    assert out[1.0] == 4.0


def test_weighted_percentiles_matches_brute_force_keyed(spark):
    rng = random.Random(3)
    rows = [(["k1", "k2"][i % 2], float(rng.randint(0, 50)),
             float(rng.randint(1, 9))) for i in range(400)]
    df = spark.createDataFrame(rows, "k string, v double, w double")
    ps = [0.25, 0.5, 0.75, 0.99]
    got = {(r.k, r.p): r.value for r in
           weighted_percentiles(df, "v", "w", ps, by=["k"]).collect()}
    for k in ("k1", "k2"):
        data = sorted((v, w) for kk, v, w in rows if kk == k)
        tot = sum(w for _, w in data)
        for p in ps:
            cum = 0.0
            for v, w in data:
                cum += w
                if cum >= p * tot:
                    assert got[(k, p)] == v, (k, p)
                    break
