"""Value tests for TTR/readability/nDCG/Poisson-bootstrap operators."""

import hashlib
import math

from pyspark.sql import functions as F

from feathr_spark.operators.sampling import (
    _POISSON1_CDF,
    poisson_bootstrap_ci,
)
from feathr_spark.operators.search import ndcg_at_k
from feathr_spark.operators.text import readability, type_token_stats


def test_type_token_stats_hand_case(spark):
    df = spark.createDataFrame(
        [(1, "The cat the dog"), (2, "aa aa aa")],
        "doc_id int, text string")
    got = {r.doc_id: r for r in type_token_stats(df).collect()}
    r1 = got[1]
    assert r1.n_tokens == 4 and r1.n_types == 3
    assert abs(r1.ttr - 0.75) < 1e-12
    assert abs(r1.hapax_ratio - 2 / 3) < 1e-12
    r2 = got[2]
    assert r2.n_tokens == 3 and r2.n_types == 1 and r2.hapax_ratio == 0.0


def test_readability_hand_case(spark):
    df = spark.createDataFrame(
        [(1, "The cat sat. The dog ran!"), (2, "?!")],
        "doc_id int, text string")
    got = {r.doc_id: r for r in readability(df).collect()}
    r = got[1]
    assert r.n_words == 6 and r.n_sentences == 2 and r.n_syllables == 6
    assert abs(r.flesch - (206.835 - 1.015 * 3 - 84.6 * 1)) < 1e-9
    assert abs(r.fk_grade - (0.39 * 3 + 11.8 * 1 - 15.59)) < 1e-9
    assert got[2].flesch is None and got[2].fk_grade is None


def test_ndcg_perfect_ranking_is_one(spark):
    rows = [("q", i, 10.0 - i, 3 - min(i, 3)) for i in range(6)]
    df = spark.createDataFrame(rows, "g string, item int, s double, r int")
    out = ndcg_at_k(df, "g", "item", "s", "r", k=4).collect()[0]
    assert abs(out.ndcg - 1.0) < 1e-12
    assert out.n_items == 6


def test_ndcg_hand_computed(spark):
    # scores rank items [a, b, c]; relevance says ideal is [c, a, b]
    rows = [("q", "a", 3.0, 2), ("q", "b", 2.0, 0), ("q", "c", 1.0, 3)]
    df = spark.createDataFrame(rows, "g string, item string, s double, r int")
    out = ndcg_at_k(df, "g", "item", "s", "r", k=3).collect()[0]
    dcg = (2 ** 2 - 1) / math.log2(2) + (2 ** 0 - 1) / math.log2(3) \
        + (2 ** 3 - 1) / math.log2(4)
    idcg = (2 ** 3 - 1) / math.log2(2) + (2 ** 2 - 1) / math.log2(3) \
        + (2 ** 0 - 1) / math.log2(4)
    assert abs(out.dcg - dcg) < 1e-12
    assert abs(out.idcg - idcg) < 1e-12
    assert abs(out.ndcg - dcg / idcg) < 1e-12


def test_ndcg_zero_relevance_group_null(spark):
    rows = [("q", "a", 3.0, 0), ("q", "b", 2.0, 0)]
    df = spark.createDataFrame(rows, "g string, item string, s double, r int")
    assert ndcg_at_k(df, "g", "item", "s", "r", k=2).collect()[0].ndcg \
        is None


def _py_mult(salt, rid, b):
    h = hashlib.md5(f"{salt}{rid}:{b // 4}".encode()).hexdigest()
    lane = b % 4
    u = int(h[lane * 8:lane * 8 + 8], 16) / 16 ** 8
    for k, c in enumerate(_POISSON1_CDF):
        if u < c:
            return k
    return 8


def test_poisson_bootstrap_matches_pure_python(spark):
    vals = [(str(i), round(50.0 + (i * 7919) % 100 / 3.0, 4))
            for i in range(60)]
    df = spark.createDataFrame(vals, "id string, v double")
    out = poisson_bootstrap_ci(df, "v", "id", n_boot=8).collect()[0]

    import numpy as np
    means = []
    for b in range(8):
        s = w = 0.0
        for rid, v in vals:
            m = _py_mult("", rid, b)
            s += m * v
            w += m
        means.append(s / w)
    lo, hi = np.quantile(means, [0.025, 0.975], method="linear")
    assert out.n == 60 and out.n_boot == 8
    assert abs(out.mean - sum(v for _, v in vals) / 60) < 1e-9
    assert abs(out.ci_lo - lo) < 1e-9
    assert abs(out.ci_hi - hi) < 1e-9


def test_poisson_bootstrap_brackets_mean(spark):
    df = spark.range(500).select(
        F.col("id").cast("string").alias("id"),
        (F.col("id") % 97).cast("double").alias("v"))
    out = poisson_bootstrap_ci(df, "v", "id", n_boot=32).collect()[0]
    assert out.ci_lo <= out.mean <= out.ci_hi
    assert out.ci_lo < out.ci_hi


def test_doc_keywords_rank_and_ties(spark):
    from feathr_spark.operators.search import doc_keywords
    docs = spark.createDataFrame(
        [(1, "apple apple banana common"), (2, "cherry common common")],
        "doc_id int, text string")
    out = doc_keywords(docs, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.rank, r.term))
    # doc 1: apple tf=2 rare -> rank 1; banana rare tf=1 beats common
    assert sorted(by_doc[1]) == [(1, "apple"), (2, "banana")]
    # doc 2: common tf=2 but low idf vs cherry tf=1 rare
    import math
    idf_rare = math.log(3 / 2) + 1       # df=1, n=2
    idf_common = math.log(3 / 3) + 1     # df=2
    cherry, common2 = 1 * idf_rare, 2 * idf_common
    expect = [(1, "cherry"), (2, "common")] if cherry > common2 \
        else [(1, "common"), (2, "cherry")]
    assert sorted(by_doc[2]) == expect


def test_reservoir_sample_deterministic_and_sized(spark):
    from feathr_spark.operators.sampling import reservoir_sample
    df = spark.createDataFrame([(str(i),) for i in range(500)],
                               "doc_id string")
    a = {r.doc_id for r in reservoir_sample(df, 50).collect()}
    b = {r.doc_id for r in reservoir_sample(df, 50).collect()}
    assert len(a) == 50 and a == b
    c = {r.doc_id for r in reservoir_sample(df, 50, salt="x").collect()}
    assert c != a  # salt changes the draw


def test_reservoir_weighted_matches_pure_python(spark):
    import hashlib, math
    from feathr_spark.operators.sampling import reservoir_sample
    rows = [(str(i), float(1 + i % 7)) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id string, w double")
    got = {r.doc_id for r in
           reservoir_sample(df, 20, weight_col="w").collect()}

    def key(rid, w):
        u = int(hashlib.md5(rid.encode()).hexdigest()[:15], 16) / 16 ** 15
        return -math.log(max(u, 1e-18)) / w
    expect = {rid for rid, _ in
              sorted(rows, key=lambda t: key(*t))[:20]}
    assert got == expect


def test_reservoir_weighted_favors_heavy_rows(spark):
    from feathr_spark.operators.sampling import reservoir_sample
    rows = [(f"h{i}", 1000.0) for i in range(50)] + \
           [(f"l{i}", 0.001) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id string, w double")
    got = [r.doc_id for r in
           reservoir_sample(df, 30, weight_col="w").collect()]
    heavy = sum(1 for d in got if d.startswith("h"))
    assert heavy >= 28  # overwhelming weight ratio


def test_k_anonymity_hand_case(spark):
    from feathr_spark.operators.quality import k_anonymity
    rows = ([("a", "x", 1)] * 5 + [("a", "y", 2)] * 2
            + [("b", "x", 3)] * 1)
    df = spark.createDataFrame(rows, "q1 string, q2 string, s int")
    out = k_anonymity(df, ["q1", "q2"], k=3,
                      sensitive_col="s").collect()[0]
    assert out.n_rows == 8 and out.n_groups == 3
    assert out.min_group_size == 1
    assert out.violating_groups == 2      # (a,y)=2 and (b,x)=1
    assert out.rows_at_risk == 3
    assert abs(out.risk_pct - 3 / 8) < 1e-12
    # every group has exactly 1 distinct sensitive value -> all 3 low
    assert out.low_diversity_groups == 3


def test_temperature_rates_properties(spark):
    from feathr_spark.operators.mixture import temperature_rates
    rows = [("en",)] * 80 + [("de",)] * 15 + [("zh",)] * 5
    df = spark.createDataFrame(rows, "lang string")
    # alpha=1: natural distribution, every rate 1
    for r in temperature_rates(df, "lang", alpha=1.0).values():
        assert abs(r - 1.0) < 1e-9
    # alpha=0.5: tail up-weighted, head down-weighted; expected corpus
    # size preserved
    rates = temperature_rates(df, "lang", alpha=0.5)
    assert rates["zh"] > 1.0 > rates["en"]
    sizes = {"en": 80, "de": 15, "zh": 5}
    total = sum(rates[g] * n for g, n in sizes.items())
    assert abs(total - 100) < 0.01
    # alpha=0: uniform over groups
    r0 = temperature_rates(df, "lang", alpha=0.0)
    assert abs(r0["zh"] / r0["en"] - sizes["en"] / sizes["zh"]) < 1e-3


def test_temperature_mixture_expected_copies(spark):
    from feathr_spark.operators.mixture import (mixture_sample,
                                                temperature_rates)
    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id int, lang string")
    rates = temperature_rates(df, "lang", alpha=0.5)
    out = mixture_sample(df, rates, group_col="lang")
    counts = {r.lang: r.c for r in
              out.groupBy("lang").agg(__import__(
                  "pyspark.sql.functions", fromlist=["count"])
                  .count("*").alias("c")).collect()}
    # md5 draws: expected copies = rate * n, tolerance ~4 sigma
    import math
    for g, n in (("big", 900), ("small", 100)):
        exp = rates[g] * n
        frac = rates[g] - math.floor(rates[g])
        sd = math.sqrt(n * frac * (1 - frac)) + 1e-9
        assert abs(counts[g] - exp) <= 4 * sd + 1, (g, counts[g], exp)
