"""Value tests for binary changepoint and degree assortativity."""

import math

from feathr_spark.operators.graph import degree_assortativity
from feathr_spark.operators.timeseries import binary_changepoint


def test_changepoint_finds_clear_shift(spark):
    rows = [(i, 1.0 if i <= 4 else 10.0) for i in range(1, 8)]
    df = spark.createDataFrame(rows, "t int, y double")
    out = binary_changepoint(df, "t", "y").collect()[0]
    assert out.split_t == 4
    assert out.n_left == 4 and out.n_right == 3
    assert abs(out.mean_left - 1.0) < 1e-12
    assert abs(out.mean_right - 10.0) < 1e-12
    # SSE_full with means 1,10: full mean = 34/7 -> reduction = SSE_full
    # (both halves are constant so SSE_left = SSE_right = 0)
    mu = (4 * 1.0 + 3 * 10.0) / 7
    sse_full = 4 * (1 - mu) ** 2 + 3 * (10 - mu) ** 2
    assert abs(out.sse_reduction - sse_full) < 1e-9


def test_changepoint_constant_series_zero_reduction(spark):
    df = spark.createDataFrame([(i, 5.0) for i in range(1, 6)],
                               "t int, y double")
    out = binary_changepoint(df, "t", "y").collect()[0]
    assert out.split_t == 1  # ties break to the earliest split
    assert abs(out.sse_reduction) < 1e-12
    assert out.mean_left == out.mean_right == 5.0


def test_changepoint_matches_brute_force(spark):
    import random
    rng = random.Random(11)
    ys = [rng.uniform(0, 10) + (5 if i > 37 else 0) for i in range(60)]
    df = spark.createDataFrame(list(enumerate(ys)), "t int, y double")
    out = binary_changepoint(df, "t", "y").collect()[0]
    # brute force on the same decimal(18,4)-quantized values
    q = [round(y, 4) for y in ys]

    def sse(xs):
        m = sum(xs) / len(xs)
        return sum((x - m) ** 2 for x in xs)

    full = sse(q)
    best_t, best_red = None, -math.inf
    for t in range(1, len(q)):
        red = full - sse(q[:t]) - sse(q[t:])
        if red > best_red + 1e-12:
            best_t, best_red = t - 1, red
    assert out.split_t == best_t
    assert abs(out.sse_reduction - best_red) < 1e-6


def test_assortativity_star_is_minus_one(spark):
    df = spark.createDataFrame(
        [("c", "a"), ("c", "b"), ("c", "d")], "src string, dst string")
    out = degree_assortativity(df).collect()[0]
    assert out.n_edges == 3 and out.n_nodes == 4
    assert abs(out.assortativity - (-1.0)) < 1e-12


def test_assortativity_matches_pure_python(spark):
    import random
    rng = random.Random(5)
    edges = set()
    while len(edges) < 40:
        a, b = rng.randrange(12), rng.randrange(12)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    df = spark.createDataFrame(sorted(edges), "src int, dst int")
    out = degree_assortativity(df).collect()[0]

    from collections import Counter
    deg = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    xs, ys = [], []
    for a, b in edges:
        xs += [deg[a], deg[b]]
        ys += [deg[b], deg[a]]
    m = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sx2, sy2 = sum(x * x for x in xs), sum(y * y for y in ys)
    ref = (m * sxy - sx * sy) / math.sqrt(
        (m * sx2 - sx * sx) * (m * sy2 - sy * sy))
    assert out.n_edges == len(edges) and out.n_nodes == len(deg)
    assert abs(out.assortativity - ref) < 1e-12


def test_assortativity_regular_graph_null(spark):
    # a 4-cycle: every degree 2 -> zero variance -> NULL
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], "src int, dst int")
    assert degree_assortativity(df).collect()[0].assortativity is None


def test_seasonal_decompose_recovers_pattern(spark):
    from feathr_spark.operators.timeseries import seasonal_decompose
    e = [3.0, -1.0, 2.0, -4.0, 0.0, 1.0, -1.0]  # sums to 0
    rows = [(t, 100.0 + e[t % 7]) for t in range(28)]
    df = spark.createDataFrame(rows, "t int, y double")
    out = {r.t: r for r in
           seasonal_decompose(df, "t", "y", period=7,
                              trend_window=7).collect()}
    assert len(out) == 28
    # edges (first/last 3 rows) have no full MA window
    assert out[0].trend is None and out[27].trend is None
    for t in range(3, 25):
        assert abs(out[t].trend - 100.0) < 1e-9, t
        assert abs(out[t].seasonal - e[t % 7]) < 1e-9, t
        assert abs(out[t].residual) < 1e-9, t
    assert out[5].phase == 5 and out[9].phase == 2


def test_ols_multi2_exact_plane(spark):
    from feathr_spark.operators.stats import ols_multi2
    rows = [(float(2 + 3 * x1 - 1.5 * x2), float(x1), float(x2))
            for x1 in range(6) for x2 in range(5)]
    df = spark.createDataFrame(rows, "y double, x1 double, x2 double")
    out = ols_multi2(df, "y", "x1", "x2").collect()[0]
    assert abs(out.b0 - 2.0) < 1e-9
    assert abs(out.b1 - 3.0) < 1e-9
    assert abs(out.b2 - (-1.5)) < 1e-9
    assert abs(out.r2 - 1.0) < 1e-9


def test_ols_multi2_matches_numpy_lstsq(spark):
    import numpy as np
    from feathr_spark.operators.stats import ols_multi2
    rng = np.random.RandomState(4)
    x1 = rng.uniform(0, 10, 120).round(6)
    x2 = rng.uniform(-5, 5, 120).round(6)
    y = (1.0 + 0.5 * x1 - 2.0 * x2
         + rng.normal(0, 0.3, 120)).round(6)
    df = spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in zip(y, x1, x2)],
        "y double, x1 double, x2 double")
    out = ols_multi2(df, "y", "x1", "x2").collect()[0]
    X = np.column_stack([np.ones(120), x1, x2])
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    assert abs(out.b0 - beta[0]) < 1e-6
    assert abs(out.b1 - beta[1]) < 1e-6
    assert abs(out.b2 - beta[2]) < 1e-6
    resid = y - X @ beta
    r2 = 1 - (resid ** 2).sum() / ((y - y.mean()) ** 2).sum()
    assert abs(out.r2 - r2) < 1e-6


def test_ols_multi2_collinear_null(spark):
    from feathr_spark.operators.stats import ols_multi2
    rows = [(float(i), float(i), float(2 * i)) for i in range(10)]
    df = spark.createDataFrame(rows, "y double, x1 double, x2 double")
    out = ols_multi2(df, "y", "x1", "x2").collect()[0]
    assert out.b0 is None and out.r2 is None


def test_gram_matrix_matches_numpy(spark):
    import numpy as np
    from feathr_spark.operators.similarity import gram_matrix
    rng = np.random.RandomState(7)
    X = rng.uniform(-1, 1, (40, 5)).round(6)
    df = spark.createDataFrame([(row.tolist(),) for row in X],
                               "embedding array<double>")
    got = {(r.i, r.j): r.g for r in gram_matrix(df).collect()}
    G = X.T @ X
    assert len(got) == 15
    for i in range(5):
        for j in range(i, 5):
            assert abs(got[(i, j)] - G[i, j]) < 1e-9, (i, j)


def test_pca_components_match_numpy_eigh(spark):
    import numpy as np
    from feathr_spark.operators.similarity import pca_components
    rng = np.random.RandomState(3)
    base = rng.normal(0, 1, (200, 4)) @ np.diag([5.0, 2.0, 0.5, 0.1])
    X = base.round(6)
    df = spark.createDataFrame([(row.tolist(),) for row in X],
                               "embedding array<double>")
    comps, ratio = pca_components(df, k=2)
    C = np.cov(X, rowvar=False)
    vals, vecs = np.linalg.eigh(C)
    order = np.argsort(vals)[::-1][:2]
    for got, idx in zip(comps, order):
        v = vecs[:, idx]
        if v[np.argmax(np.abs(v))] < 0:
            v = -v
        assert np.allclose(got, v, atol=1e-6)
    assert ratio[0] > ratio[1] > 0


def test_gram_matrix_arrow_equals_jvm_path(spark):
    import numpy as np
    from feathr_spark.operators.similarity import gram_matrix
    rng = np.random.RandomState(9)
    X = rng.uniform(-3, 3, (60, 6)).round(6)
    df = spark.createDataFrame([(row.tolist(),) for row in X],
                               "embedding array<double>").repartition(4)
    a = {(r.i, r.j): r.g for r in
         gram_matrix(df, use_arrow=True).collect()}
    b = {(r.i, r.j): r.g for r in
         gram_matrix(df, use_arrow=False).collect()}
    assert a == b and len(a) == 21


def test_pareto_contribution_hand_case(spark):
    from feathr_spark.operators.olap import pareto_contribution
    # key values: 50, 30, 10, 5, 5 -> total 100
    rows = [("a", 50.0), ("b", 30.0), ("c", 10.0), ("d", 5.0),
            ("e", 5.0)]
    df = spark.createDataFrame(rows, "k string, v double")
    out = pareto_contribution(df, "k", "v", 0.8).collect()[0]
    # top 2 keys (50+30) reach exactly 0.8
    assert out.n_keys == 5 and out.top_keys == 2
    assert abs(out.cutoff_value - 30.0) < 1e-9
    assert abs(out.top_share - 0.8) < 1e-12
    assert abs(out.total - 100.0) < 1e-9


def test_pareto_contribution_ties_included(spark):
    from feathr_spark.operators.olap import pareto_contribution
    rows = [("a", 40.0), ("b", 30.0), ("c", 30.0), ("d", 0.0)]
    df = spark.createDataFrame(rows, "k string, v double")
    out = pareto_contribution(df, "k", "v", 0.5).collect()[0]
    # 40 alone = 0.4 < 0.5; cutoff drops to 30 and BOTH tied keys join
    assert out.top_keys == 3
    assert abs(out.cutoff_value - 30.0) < 1e-9
    assert abs(out.top_share - 1.0) < 1e-12


def test_pareto_contribution_matches_brute_force(spark):
    import random
    from feathr_spark.operators.olap import pareto_contribution
    rng = random.Random(2)
    rows = [(str(i), float(rng.randint(1, 1000))) for i in range(200)]
    df = spark.createDataFrame(rows, "k string, v double")
    out = pareto_contribution(df, "k", "v", 0.8, buckets=16).collect()[0]
    vals = sorted((v for _, v in rows), reverse=True)
    tot = sum(vals)
    # brute force: max v with share(>= v) >= 0.8
    cut = None
    for v in sorted(set(vals), reverse=True):
        if sum(x for x in vals if x >= v) / tot >= 0.8:
            cut = v
            break
    top = [x for x in vals if x >= cut]
    assert abs(out.cutoff_value - cut) < 1e-9
    assert out.top_keys == len(top)
    assert abs(out.top_share - sum(top) / tot) < 1e-9


def test_rolling_corr_perfect_and_anti(spark):
    from feathr_spark.operators.timeseries import rolling_corr
    rows = [(t, float(t), float(2 * t + 5)) for t in range(20)]
    df = spark.createDataFrame(rows, "t int, x double, y double")
    out = {r.t: r.corr for r in
           rolling_corr(df, "t", "x", "y", window_n=5).collect()}
    assert out[0] is None and out[3] is None  # partial windows
    for t in range(4, 20):
        assert abs(out[t] - 1.0) < 1e-9, t
    rows = [(t, float(t), float(-3 * t)) for t in range(10)]
    df = spark.createDataFrame(rows, "t int, x double, y double")
    out = rolling_corr(df, "t", "x", "y", window_n=4).collect()
    assert all(abs(r.corr + 1.0) < 1e-9 for r in out if r.corr
               is not None)


def test_rolling_corr_matches_numpy(spark):
    import numpy as np
    from feathr_spark.operators.timeseries import rolling_corr
    rng = np.random.RandomState(8)
    x = rng.uniform(0, 10, 40).round(4)
    y = (0.5 * x + rng.normal(0, 2, 40)).round(4)
    df = spark.createDataFrame(
        [(t, float(a), float(b)) for t, (a, b) in enumerate(zip(x, y))],
        "t int, x double, y double")
    got = {r.t: r.corr for r in
           rolling_corr(df, "t", "x", "y", window_n=10).collect()}
    for t in range(9, 40):
        ref = np.corrcoef(x[t - 9:t + 1], y[t - 9:t + 1])[0, 1]
        # operator computes on EXACT 4-dp decimals; numpy on their
        # binary-double approximations — agree to ~1e-7
        assert abs(got[t] - ref) < 1e-6, t


def test_cross_correlation_finds_known_shift(spark):
    import numpy as np
    from feathr_spark.operators.timeseries import cross_correlation
    rng = np.random.RandomState(6)
    base = rng.uniform(0, 10, 60)
    # y leads x by 3: x_t = y_{t-3} (+ tiny noise)
    y = base
    x = np.roll(base, 3) + rng.normal(0, 0.01, 60)
    df = spark.createDataFrame(
        [(t, float(x[t]), float(y[t])) for t in range(3, 60)],
        "t int, x double, y double")
    out = {r.lag: r.ccf for r in
           cross_correlation(df, "t", "x", "y", max_lag=5).collect()}
    best = max(out, key=lambda k: out[k] if out[k] is not None
               else -2)
    assert best == 3
    assert out[3] > 0.95


def test_cross_correlation_matches_reference(spark):
    import numpy as np
    from feathr_spark.operators.timeseries import cross_correlation
    rng = np.random.RandomState(12)
    x = rng.uniform(0, 1, 30)
    y = rng.uniform(0, 1, 30)
    df = spark.createDataFrame(
        [(t, float(x[t]), float(y[t])) for t in range(30)],
        "t int, x double, y double")
    got = {r.lag: (r.n_pairs, r.ccf) for r in
           cross_correlation(df, "t", "x", "y", max_lag=4).collect()}
    mx, my = x.mean(), y.mean()
    ssx, ssy = ((x - mx) ** 2).sum(), ((y - my) ** 2).sum()
    for k in range(-4, 5):
        num = n = 0.0
        for t in range(30):
            tp = t - k
            if 0 <= tp < 30:
                num += (x[t] - mx) * (y[tp] - my)
                n += 1
        ref = num / (ssx ** 0.5 * ssy ** 0.5)
        assert got[k][0] == int(n)
        assert abs(got[k][1] - ref) < 1e-9, k


def test_modularity_two_cliques(spark):
    from feathr_spark.operators.graph import modularity
    # two triangles joined by one bridge edge; communities = cliques
    edges = [("a1", "a2"), ("a1", "a3"), ("a2", "a3"),
             ("b1", "b2"), ("b1", "b3"), ("b2", "b3"),
             ("a1", "b1")]
    e = spark.createDataFrame(edges, "src string, dst string")
    assign = spark.createDataFrame(
        [(n, n[0]) for n in
         ["a1", "a2", "a3", "b1", "b2", "b3"]],
        "id string, community string")
    out = modularity(e, assign).collect()[0]
    # m=7; within_a=3, d_a=7; within_b=3, d_b=7
    ref = (3 / 7 - (7 / 14) ** 2) * 2
    assert out.m_edges == 7 and out.n_comms == 2
    assert abs(out.modularity - ref) < 1e-12


def test_modularity_random_partition_near_zero(spark):
    import random
    from feathr_spark.operators.graph import modularity
    rng = random.Random(1)
    edges = set()
    while len(edges) < 60:
        x, y = rng.randrange(20), rng.randrange(20)
        if x != y:
            edges.add((f"n{min(x, y)}", f"n{max(x, y)}"))
    e = spark.createDataFrame(sorted(edges), "src string, dst string")
    assign = spark.createDataFrame(
        [(f"n{i}", str(i % 2)) for i in range(20)],
        "id string, community string")
    out = modularity(e, assign).collect()[0]
    # random bipartition of a random graph: |Q| small
    assert abs(out.modularity) < 0.15
