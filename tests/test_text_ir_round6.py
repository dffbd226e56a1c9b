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
