"""Value tests for the distribution-distance operators."""

import math

from pyspark.sql import functions as F

from feathr_spark.operators.distance import (
    js_divergence,
    kendall_tau,
    ks_2sample,
    wasserstein_1d,
)


def _two_sample_df(spark, a_vals, b_vals):
    rows = [("a", float(v)) for v in a_vals] + \
           [("b", float(v)) for v in b_vals]
    return spark.createDataFrame(rows, "g string, v double")


def test_ks_identical_is_zero(spark):
    df = _two_sample_df(spark, [1, 2, 3, 4], [1, 2, 3, 4])
    row = ks_2sample(df, "g", "v", "a", "b").collect()[0]
    assert row.d_stat == 0.0
    assert row.n_a == 4 and row.n_b == 4
    assert row.p_value == 1.0


def test_ks_disjoint_is_one_and_shifted_value(spark):
    df = _two_sample_df(spark, [1, 2], [3, 4])
    assert ks_2sample(df, "g", "v", "a", "b").collect()[0].d_stat == 1.0
    # a=[1,2,3,4], b=[2,3,4,5]: max CDF gap is 0.25 at every value
    df = _two_sample_df(spark, [1, 2, 3, 4], [2, 3, 4, 5])
    row = ks_2sample(df, "g", "v", "a", "b").collect()[0]
    assert abs(row.d_stat - 0.25) < 1e-12
    m = 4 * 4 / 8.0
    expect = min(1.0, 2 * math.exp(-2 * m * 0.25 ** 2))
    assert abs(row.p_value - expect) < 1e-12


def test_ks_bucketing_never_changes_the_answer(spark):
    import random
    rng = random.Random(7)
    a = [rng.gauss(0, 1) for _ in range(200)]
    b = [rng.gauss(0.5, 1.3) for _ in range(150)]
    df = _two_sample_df(spark, a, b)
    d1 = ks_2sample(df, "g", "v", "a", "b", buckets=1).collect()[0].d_stat
    d64 = ks_2sample(df, "g", "v", "a", "b", buckets=64).collect()[0].d_stat
    # pure-python reference
    xs = sorted(set(a) | set(b))
    ref = max(abs(sum(1 for v in a if v <= x) / len(a)
                  - sum(1 for v in b if v <= x) / len(b)) for x in xs)
    assert abs(d1 - ref) < 1e-12 and abs(d64 - ref) < 1e-12


def test_wasserstein_shift_and_identity(spark):
    df = _two_sample_df(spark, [0, 1], [2, 3])
    assert abs(wasserstein_1d(df, "g", "v", "a", "b")
               .collect()[0].w1 - 2.0) < 1e-12
    df = _two_sample_df(spark, [5, 6, 7], [5, 6, 7])
    assert wasserstein_1d(df, "g", "v", "a", "b").collect()[0].w1 == 0.0


def test_wasserstein_matches_reference_across_buckets(spark):
    import random
    rng = random.Random(3)
    a = [rng.uniform(0, 10) for _ in range(120)]
    b = [rng.uniform(2, 12) for _ in range(80)]
    df = _two_sample_df(spark, a, b)

    xs = sorted(set(a) | set(b))
    ref = 0.0
    for x, nx in zip(xs, xs[1:]):
        fa = sum(1 for v in a if v <= x) / len(a)
        fb = sum(1 for v in b if v <= x) / len(b)
        ref += abs(fa - fb) * (nx - x)
    for buckets in (1, 5, 64):
        w = wasserstein_1d(df, "g", "v", "a", "b",
                           buckets=buckets).collect()[0].w1
        assert abs(w - ref) < 1e-9, buckets


def _jsd_ref(p_counts, q_counts):
    tp, tq = sum(p_counts.values()), sum(q_counts.values())
    cats = set(p_counts) | set(q_counts)
    out = 0.0
    for c in cats:
        p = p_counts.get(c, 0) / tp
        q = q_counts.get(c, 0) / tq
        m = (p + q) / 2
        if p:
            out += 0.5 * p * math.log2(p / m)
        if q:
            out += 0.5 * q * math.log2(q / m)
    return out


def test_jsd_identical_groups_zero(spark):
    rows = [("g1", "A"), ("g1", "B"), ("g2", "A"), ("g2", "B")]
    df = spark.createDataFrame(rows, "g string, c string")
    for r in js_divergence(df, "c", ["g"]).collect():
        assert abs(r.jsd) < 1e-12


def test_jsd_matches_reference_with_absent_categories(spark):
    # g1 never sees C; g2 never sees A — exercises the algebraic
    # absent-category term
    rows = (["A"] * 5 + ["B"] * 3, ["B"] * 2 + ["C"] * 6)
    data = [("g1", c) for c in rows[0]] + [("g2", c) for c in rows[1]]
    df = spark.createDataFrame(data, "g string, c string")
    got = {r.g: r.jsd for r in js_divergence(df, "c", ["g"]).collect()}
    from collections import Counter
    pooled = Counter(rows[0] + rows[1])
    assert abs(got["g1"] - _jsd_ref(Counter(rows[0]), pooled)) < 1e-12
    assert abs(got["g2"] - _jsd_ref(Counter(rows[1]), pooled)) < 1e-12


def test_kendall_monotone_and_reversed(spark):
    df = spark.createDataFrame([(i, i * 2.0) for i in range(10)],
                               "x int, y double")
    assert kendall_tau(df, "x", "y").collect()[0].tau_b == 1.0
    df = spark.createDataFrame([(i, -i * 2.0) for i in range(10)],
                               "x int, y double")
    assert kendall_tau(df, "x", "y").collect()[0].tau_b == -1.0


def test_kendall_tau_b_ties_match_reference(spark):
    xs = [1, 2, 3, 3, 5, 5, 5, 8]
    ys = [1, 3, 2, 4, 4, 6, 5, 5]
    df = spark.createDataFrame(list(zip(xs, ys)), "x int, y int")
    row = kendall_tau(df, "x", "y").collect()[0]
    # pure-python tau-b
    n = len(xs)
    c = d = n1 = n2 = 0
    for i in range(n):
        for j in range(i + 1, n):
            sx, sy = xs[i] - xs[j], ys[i] - ys[j]
            if sx * sy > 0:
                c += 1
            elif sx * sy < 0:
                d += 1
            if sx == 0:
                n1 += 1
            if sy == 0:
                n2 += 1
    n0 = n * (n - 1) / 2
    ref = (c - d) / math.sqrt((n0 - n1) * (n0 - n2))
    assert row.concordant == c and row.discordant == d
    assert abs(row.tau_b - ref) < 1e-12


def test_cvm_identical_zero_and_matches_reference(spark):
    from feathr_spark.operators.distance import cvm_2sample
    df = _two_sample_df(spark, [1, 2, 3], [1, 2, 3])
    assert cvm_2sample(df, "g", "v", "a", "b").collect()[0].t_stat == 0.0

    import random
    rng = random.Random(13)
    a = [rng.gauss(0, 1) for _ in range(80)]
    b = [rng.gauss(1, 2) for _ in range(60)]
    df = _two_sample_df(spark, a, b)
    got = cvm_2sample(df, "g", "v", "a", "b").collect()[0]
    # pure-python reference over the combined sample
    na, nb, N = len(a), len(b), len(a) + len(b)
    s = 0.0
    for z in a + b:
        fa = sum(1 for v in a if v <= z) / na
        fb = sum(1 for v in b if v <= z) / nb
        s += (fa - fb) ** 2
    ref = na * nb / N ** 2 * s
    assert abs(got.t_stat - ref) < 1e-9
    assert got.n_a == na and got.n_b == nb


def test_two_sample_distances_property(spark):
    """Property check: for ARBITRARY float samples, the distributed
    KS / W1 / CvM statistics equal the brute-force definitions.
    Hypothesis drives sample shapes; each draw spins one Spark job, so
    examples stay few but adversarial (ties, duplicates, negatives,
    single-element sides)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from feathr_spark.operators.distance import cvm_2sample

    vals = st.lists(
        st.floats(min_value=-1e6, max_value=1e6,
                  allow_nan=False, allow_infinity=False,
                  width=32),
        min_size=1, max_size=25)

    @settings(max_examples=12, deadline=None)
    @given(a=vals, b=vals)
    def check(a, b):
        df = _two_sample_df(spark, a, b)
        na, nb = len(a), len(b)
        xs = sorted(set(a) | set(b))

        def fa(x):
            return sum(1 for v in a if v <= x) / na

        def fb(x):
            return sum(1 for v in b if v <= x) / nb

        ks = ks_2sample(df, "g", "v", "a", "b", buckets=7).collect()[0]
        assert abs(ks.d_stat - max(abs(fa(x) - fb(x))
                                   for x in xs)) < 1e-9
        w = wasserstein_1d(df, "g", "v", "a", "b",
                           buckets=7).collect()[0]
        ref_w = sum(abs(fa(x) - fb(x)) * (nx - x)
                    for x, nx in zip(xs, xs[1:]))
        assert abs(w.w1 - ref_w) < 1e-6 * max(1.0, abs(ref_w))
        cvm = cvm_2sample(df, "g", "v", "a", "b",
                          buckets=7).collect()[0]
        ref_t = (na * nb / (na + nb) ** 2
                 * sum((fa(z) - fb(z)) ** 2 for z in a + b))
        assert abs(cvm.t_stat - ref_t) < 1e-9

    check()


def test_ks_one_sided_empty_group_nulls(spark):
    # all rows in one group: the other side's CDF divides by zero ->
    # NULL statistic rather than a crash (documented degenerate case)
    df = spark.createDataFrame([("a", 1.0), ("a", 2.0)],
                               "g string, v double")
    row = ks_2sample(df, "g", "v", "a", "b").collect()[0]
    assert row.n_b == 0
    assert row.d_stat is None
