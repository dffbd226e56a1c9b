"""Value tests for the round-6 sixth batch: Theil-Sen trend, HITS,
Benjamini-Hochberg FDR, power-law degree MLE."""
import math
import random

import pytest

from feathr_spark.operators.graph import degree_powerlaw, hits
from feathr_spark.operators.stats import bh_fdr
from feathr_spark.operators.timeseries import theil_sen


# ---------------------------------------------------------------- theil-sen

def test_theil_sen_exact_line_with_outliers(spark):
    # 20 points on y = 3x + 7 with 4 wild outliers: the median of
    # pairwise slopes stays exactly 3 (a majority of pairs avoid
    # outliers), OLS would not
    rows = [(float(x), 3.0 * x + 7.0) for x in range(20)]
    rows += [(30.0, 1e6), (31.0, -1e6), (32.0, 5e5), (33.0, -4e5)]
    df = spark.createDataFrame(rows, "t double, y double")
    r = theil_sen(df, "t", "y").collect()[0]
    assert r.slope == 3.0
    assert r.intercept == 7.0
    assert r.n == 24


def test_theil_sen_matches_brute_force_keyed(spark):
    rng = random.Random(9)
    data = {"a": [(float(i), rng.uniform(0, 10)) for i in range(15)],
            "b": [(float(i), 2.0 * i + rng.uniform(-1, 1))
                  for i in range(12)]}
    rows = [(k, t, y) for k, pts in data.items() for t, y in pts]
    df = spark.createDataFrame(rows, "k string, t double, y double")
    got = {r.k: r for r in
           theil_sen(df, "t", "y", by=["k"]).collect()}
    for k, pts in data.items():
        slopes = sorted((y2 - y1) / (x2 - x1)
                        for i, (x1, y1) in enumerate(pts)
                        for (x2, y2) in pts[i + 1:])
        m = len(slopes)
        med = (slopes[m // 2] if m % 2 else
               (slopes[m // 2 - 1] + slopes[m // 2]) / 2)
        assert abs(got[k].slope - round(med + 1e-9, 4)) < 1e-9, k
        res = sorted(y - med * x for x, y in pts)
        mb = (res[len(res) // 2] if len(res) % 2 else
              (res[len(res) // 2 - 1] + res[len(res) // 2]) / 2)
        assert abs(got[k].intercept - round(mb + 1e-9, 4)) < 1e-4, k


# ---------------------------------------------------------------- hits

def _hits_brute(edges, iters=3):
    srcs = sorted({u for u, _ in edges})
    dsts = sorted({v for _, v in edges})
    h = {u: 1.0 / len(srcs) for u in srcs}
    a = {}
    for _ in range(iters):
        a = {v: sum(h[u] for u, vv in edges if vv == v) for v in dsts}
        s = sum(a.values())
        a = {v: x / s for v, x in a.items()}
        h = {u: sum(a[v] for uu, v in edges if uu == u) for u in srcs}
        s = sum(h.values())
        h = {u: x / s for u, x in h.items()}
    return h, a


def test_hits_bipartite_matches_brute_force(spark):
    rng = random.Random(21)
    edges = list({(f"u{rng.randint(0, 7)}", f"p{rng.randint(0, 11)}")
                  for _ in range(40)})
    df = spark.createDataFrame(edges, "src string, dst string")
    hb, ab = _hits_brute(edges)
    out = {r.id: r for r in hits(df, iters=3).collect()}
    for u, v in hb.items():
        assert abs(out[u].hub - v) < 1e-9, u
        assert out[u].authority == 0.0
    for p, v in ab.items():
        assert abs(out[p].authority - v) < 1e-9, p
        assert out[p].hub == 0.0


def test_hits_star_graph(spark):
    # one hub pointing at 3 products, another at 1 of them
    edges = [("big", "x"), ("big", "y"), ("big", "z"), ("small", "x")]
    df = spark.createDataFrame(edges, "src string, dst string")
    out = {r.id: r for r in hits(df, iters=5).collect()}
    assert out["big"].hub > out["small"].hub
    assert out["x"].authority > out["y"].authority  # two pointers


# ---------------------------------------------------------------- bh-fdr

def test_bh_fdr_textbook(spark):
    # classic worked example (n=6)
    ps = [("t1", 0.001), ("t2", 0.008), ("t3", 0.039),
          ("t4", 0.041), ("t5", 0.042), ("t6", 0.06)]
    df = spark.createDataFrame(ps, "test string, p double")
    out = {r.test: r for r in
           bh_fdr(df, "p", ["test"], alpha=0.05).collect()}
    # raw q_i = p_i * 6 / i; then running min from the right:
    # q6=.06, q5=min(.0504,.06)=.0504, q4=min(.0615, .0504)=.0504,
    # q3=min(.078,...)=.0504, q2=.024, q1=.006
    assert abs(out["t1"].q - 0.006) < 1e-12
    assert abs(out["t2"].q - 0.024) < 1e-12
    for t in ("t3", "t4", "t5"):
        assert abs(out[t].q - 0.0504) < 1e-12, t
    assert abs(out["t6"].q - 0.06) < 1e-12
    assert out["t1"].rejected and out["t2"].rejected
    assert not out["t3"].rejected and not out["t6"].rejected


def test_bh_fdr_all_null_and_clamp(spark):
    ps = [("a", 0.9), ("b", 0.99), ("c", None)]
    df = spark.createDataFrame(ps, "test string, p double")
    out = {r.test: r for r in bh_fdr(df, "p", ["test"]).collect()}
    assert set(out) == {"a", "b"}          # NULL p dropped, n=2
    assert out["b"].q == 0.99
    assert abs(out["a"].q - min(0.9 * 2 / 1, 0.99)) < 1e-12


# ---------------------------------------------------------------- power law

def test_degree_powerlaw_hand_graph(spark):
    # star with 5 leaves + one extra edge: degrees hub=5, one leaf=2,
    # others 1; pair-leaf extra edge leaf1-leaf2
    edges = [("h", f"l{i}") for i in range(5)] + [("l0", "l1")]
    df = spark.createDataFrame(edges, "src string, dst string")
    r = degree_powerlaw(df, dmin=2).collect()[0]
    assert r.n_nodes == 6 and r.max_degree == 5
    assert r.n_tail == 3                     # h(5), l0(2), l1(2)
    want = 1 + 3 / (math.log(5 / 1.5) + 2 * math.log(2 / 1.5))
    assert abs(r.alpha - want) < 1e-9


def test_degree_powerlaw_no_tail_null(spark):
    edges = [("a", "b"), ("c", "d")]
    df = spark.createDataFrame(edges, "src string, dst string")
    r = degree_powerlaw(df, dmin=5).collect()[0]
    assert r.alpha is None and r.n_tail == 0


def test_hits_iters_cap_raises(spark):
    import pytest
    from feathr_spark.operators.graph import hits
    df = spark.createDataFrame([(1, 2)], "src bigint, dst bigint")
    with pytest.raises(ValueError, match="capped at 20"):
        hits(df, iters=21)
    with pytest.raises(ValueError, match=">= 1"):
        hits(df, iters=0)


def test_selection_percentile_matches_builtin_percentile(spark):
    """Distributed-selection exact percentile == F.percentile bitwise,
    including the interpolated (fractional-rank) cases and heavy ties."""
    from pyspark.sql import functions as F
    from feathr_spark.operators.stats import selection_percentile
    import random
    random.seed(11)
    vals = ([random.gauss(0, 10) for _ in range(500)]
            + [3.25] * 200 + [-1e9, 1e9])
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    for frac in (0.0, 0.25, 0.5, 0.731, 1.0):
        a = selection_percentile(df, "v", frac, buckets=64).collect()[0][0]
        b = df.agg(F.percentile(F.col("v"), F.lit(frac))).collect()[0][0]
        assert a == b, (frac, a, b)
