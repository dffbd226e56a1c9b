"""Round-9 batch-4 operators: PMI collocation mining, simplified
silhouette over labeled embeddings, cross-split embedding leakage,
split-conformal forecast intervals."""

import math

import pytest
from pyspark.sql import functions as F

from feathr_spark.operators.lm import pmi_collocations


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string")


# ------------------------------------------------------------------ PMI

def test_pmi_collocations_hand_computed(spark):
    # corpus: "new york" always together (high PMI); "the cat" /
    # "the dog" share a promiscuous left word (low PMI)
    texts = ["new york " * 6, "the cat sat", "the dog sat",
             "the cat ran", "the dog ran"]
    out = pmi_collocations(_docs(spark, texts), min_count=2, k=10)
    rows = {(r["w1"], r["w2"]): r for r in out.collect()}
    assert ("new", "york") in rows
    # hand-compute pmi(new, york): tokens N, transitions B from the
    # same whole-doc zip the operator uses
    toks = [t.strip().lower().split() for t in texts]
    N = sum(len(t) for t in toks)
    B = sum(len(t) - 1 for t in toks if len(t) > 1)
    c12 = sum(1 for t in toks for a, b in zip(t, t[1:])
              if (a, b) == ("new", "york"))
    c1 = sum(t.count("new") for t in toks)
    c2 = sum(t.count("york") for t in toks)
    want = math.log(c12 * N * N / (B * c1 * c2))
    got = rows[("new", "york")]["pmi"]
    assert abs(got - want) < 1e-3
    # t-score sanity: positive association => t > 0
    assert rows[("new", "york")]["t_score"] > 0


def test_pmi_min_count_floor_drops_hapax(spark):
    texts = ["alpha beta gamma", "alpha beta delta"]
    out = pmi_collocations(_docs(spark, texts), min_count=2, k=10)
    pairs = {(r["w1"], r["w2"]) for r in out.collect()}
    assert ("alpha", "beta") in pairs       # count 2 survives
    assert ("beta", "gamma") not in pairs   # hapax dropped


def test_pmi_ranking_is_round_before_rank_deterministic(spark):
    # symmetric corpus: pmi(a,b) == pmi(b,a) exactly; the (w1, w2)
    # tie-break must keep both orderings stable under re-partitioning
    texts = ["a b " * 5, "b a " * 5]
    out1 = pmi_collocations(_docs(spark, texts), min_count=2, k=4)
    out2 = pmi_collocations(_docs(spark, texts).repartition(7),
                            min_count=2, k=4)
    assert [tuple(r) for r in out1.collect()] == \
        [tuple(r) for r in out2.collect()]


def test_pmi_empty_and_null_text_rows_are_ignored(spark):
    df = spark.createDataFrame(
        [(0, "x y x y x y"), (1, ""), (2, None), (3, "   ")],
        "doc_id bigint, text string")
    out = pmi_collocations(df, min_count=2, k=10).collect()
    assert {(r["w1"], r["w2"]) for r in out} == {("x", "y"), ("y", "x")}


# ----------------------------------------------------------- silhouette

from feathr_spark.operators.clustering import silhouette_labels


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int")


def test_silhouette_tight_far_clusters_near_one(spark):
    rows = [(1, [0.0, 0.0], 0), (2, [0.1, 0.0], 0),
            (3, [10.0, 10.0], 1), (4, [10.1, 10.0], 1)]
    out = {r["label"]: r for r in silhouette_labels(_emb(spark, rows)).collect()}
    # a = 0.05 (half the intra gap), b = dist to far centroid ~ 14.18
    import math
    own = 0.05
    other = math.hypot(10.05, 10.0)
    want = round((other - own) / other, 4)
    for lab in (0, 1):
        assert out[lab]["n_vecs"] == 2
        assert abs(out[lab]["mean_sil"] - want) < 2e-4


def test_silhouette_interleaved_labels_near_zero_or_negative(spark):
    # identical distributions for both labels -> centroids coincide,
    # a ~= b -> s ~= 0
    rows = [(i, [float(i % 7), float((i * 3) % 5)], i % 2)
            for i in range(40)]
    out = silhouette_labels(_emb(spark, rows)).collect()
    assert all(abs(r["mean_sil"]) < 0.3 for r in out)


def test_silhouette_matches_numpy_reference(spark):
    import numpy as np
    rng = [(i, [((i * 37) % 11) / 3.0, ((i * 53) % 13) / 4.0,
                ((i * 29) % 7) / 2.0], (i * 31) % 3) for i in range(60)]
    out = {r["label"]: r["mean_sil"]
           for r in silhouette_labels(_emb(spark, rng)).collect()}
    X = np.array([r[1] for r in rng])
    lab = np.array([r[2] for r in rng])
    cents = {l: X[lab == l].mean(axis=0) for l in set(lab)}
    sils = {l: [] for l in set(lab)}
    for x, l in zip(X, lab):
        a = np.linalg.norm(x - cents[l])
        b = min(np.linalg.norm(x - cents[o]) for o in cents if o != l)
        s = 0.0 if max(a, b) == 0 else (b - a) / max(a, b)
        sils[l].append(s)
    for l, vals in sils.items():
        # quantized engine arithmetic vs float64 numpy: loose tolerance
        assert abs(out[l] - float(np.mean(vals))) < 5e-3


def test_silhouette_is_partitioning_invariant(spark):
    rows = [(i, [float((i * 13) % 17), float((i * 7) % 19)], i % 4)
            for i in range(80)]
    a = sorted(map(tuple, silhouette_labels(_emb(spark, rows)).collect()))
    b = sorted(map(tuple, silhouette_labels(
        _emb(spark, rows).repartition(13)).collect()))
    assert a == b


def test_silhouette_requires_two_labels(spark):
    rows = [(1, [0.0, 1.0], 0), (2, [1.0, 0.0], 0)]
    with pytest.raises(ValueError, match="need >= 2 labels"):
        silhouette_labels(_emb(spark, rows))


# ------------------------------------------------------ embedding leakage

from feathr_spark.operators.dedup import cross_split_cosine_leakage
from feathr_spark.operators.sampling import hash_split, split_expr


def test_cross_split_leakage_finds_planted_near_dup(spark):
    # plant near-identical vectors under many ids; whichever pair
    # straddles the split must surface with cosine ~ 1
    base = [0.6, 0.8, 0.0]
    rows = [(i, [x + 0.001 * i for x in base], 0) for i in range(12)]
    # orthogonal distractors
    rows += [(100 + i, [0.0, 0.0, 1.0 + 0.01 * i], 0) for i in range(6)]
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int")
    fr = {"train": 0.5, "test": 0.5}
    out = cross_split_cosine_leakage(df, fr, threshold=0.99,
                                     strategy="exact").collect()
    splits = {r["vec_id"]: r["split"]
              for r in hash_split(df, fr, id_col="vec_id").collect()}
    # every returned row straddles and is oriented held-first
    for r in out:
        assert splits[r["train_id"]] == "train"
        assert splits[r["held_id"]] == "test"
        assert r["split"] == "test"
        assert r["cosine"] >= 0.99
    # the planted near-dup family must leak unless the split put the
    # whole family on one side
    fam = [i for i in range(12)]
    has_straddle = len({splits[i] for i in fam}) == 2
    fam_rows = [r for r in out if r["train_id"] < 100]
    assert has_straddle == (len(fam_rows) > 0)


def test_split_expr_matches_hash_split(spark):
    from pyspark.sql import functions as F
    df = spark.createDataFrame([(i,) for i in range(200)], "id bigint")
    fr = {"train": 0.7, "val": 0.2, "test": 0.1}
    a = hash_split(df, fr, id_col="id").select("id", "split")
    b = df.select("id", split_expr(F.col("id"), fr).alias("split"))
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_cross_split_leakage_requires_known_train_split(spark):
    df = spark.createDataFrame([(1, [1.0, 0.0])],
                               "vec_id bigint, embedding array<float>")
    with pytest.raises(ValueError, match="train_split"):
        cross_split_cosine_leakage(df, {"a": 0.5, "b": 0.5})


# ------------------------------------------------------------- conformal

from datetime import datetime, timedelta

from feathr_spark.operators.forecast import conformal_seasonal


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, value double")


def test_conformal_interval_is_order_statistic_of_residuals(spark):
    # one key, constant signal + one calibration outlier: slot means on
    # the train prefix are exact, so residuals are 0 except the outlier;
    # q = ceil((n+1)*0.9)-th smallest residual
    t0 = datetime(2024, 1, 1)
    rows = []
    for h in range(100):
        v = 5.0
        rows.append((1, t0 + timedelta(hours=h), v))
    # calibration tail starts at bucket 80 (train_frac 0.8 over 0..99);
    # plant one outlier in it
    rows.append((1, t0 + timedelta(hours=90, minutes=10), 25.0))
    out = conformal_seasonal(_events(spark, rows), ["user_id"], "ts",
                             "value", alpha=0.1).collect()
    assert len(out) == 24
    r = out[0]
    # cut = floor(0.8*99) = 79 -> cal buckets 80..99: n_cal = 20;
    # k = min(ceil(21*0.9), 20) = 19 -> q = 0 (only ONE bucket has a
    # nonzero residual, at rank 20)
    assert r["n_cal"] == 20
    assert abs(r["hi"] - r["lo"]) < 1e-9
    # alpha=0.05 -> k = min(ceil(21*0.95), 20) = 20 -> q = the outlier
    # bucket's residual: bucket mean (5 + 25)/2 = 15 vs slot mean 5
    out2 = conformal_seasonal(_events(spark, rows), ["user_id"], "ts",
                              "value", alpha=0.05).collect()
    q = (out2[0]["hi"] - out2[0]["lo"]) / 2
    assert abs(q - 10.0) < 1e-6


def test_conformal_covers_future_under_exchangeability(spark):
    # noisy-but-stationary per-slot signal: the 90% interval must cover
    # ~>= 80% of a fresh draw from the same deterministic process
    t0 = datetime(2024, 1, 1)
    def val(u, h):
        return float(u + (h % 24) + ((h * 7919) % 13) / 13.0)
    rows = [(u, t0 + timedelta(hours=h), val(u, h))
            for u in (1, 2) for h in range(200)]
    out = conformal_seasonal(_events(spark, rows), ["user_id"], "ts",
                             "value", alpha=0.1).collect()
    covered = total = 0
    for r in out:
        h = int(r["bucket_start"].timestamp() // 3600
                - t0.timestamp() // 3600)
        for u in (1, 2):
            if r["user_id"] != u:
                continue
            total += 1
            y = val(u, h)
            covered += int(r["lo"] - 1e-9 <= y <= r["hi"] + 1e-9)
    assert total == 48
    assert covered / total >= 0.8


def test_conformal_key_without_calibration_rows_is_dropped(spark):
    t0 = datetime(2024, 1, 1)
    rows = [(1, t0 + timedelta(hours=h), 1.0) for h in range(100)]
    # key 2 exists only in the train prefix
    rows += [(2, t0 + timedelta(hours=h), 1.0) for h in range(10)]
    out = conformal_seasonal(_events(spark, rows), ["user_id"], "ts",
                             "value").collect()
    assert {r["user_id"] for r in out} == {1}


def test_conformal_validates_parameters(spark):
    df = _events(spark, [(1, datetime(2024, 1, 1), 1.0)])
    with pytest.raises(ValueError, match="alpha"):
        conformal_seasonal(df, ["user_id"], "ts", "value", alpha=1.5)
    with pytest.raises(ValueError, match="train_frac"):
        conformal_seasonal(df, ["user_id"], "ts", "value", train_frac=0.0)
    with pytest.raises(ValueError, match="multiple"):
        conformal_seasonal(df, ["user_id"], "ts", "value", bucket_s=7)


# ------------------------------------------------------------ imputation

from feathr_spark.operators.impute import impute_nulls


def test_impute_mean_median_mode_hand_computed(spark):
    rows = [(1, "a", 10.0), (2, "a", 20.0), (3, "a", None),
            (4, "b", 7.0), (5, "b", None), (6, None, 5.0)]
    df = spark.createDataFrame(rows, "id bigint, grp string, v double")
    out = impute_nulls(df, {"v": "mean"}, by=["grp"])
    got = {r["id"]: (r["v"], r["v__was_null"]) for r in out.collect()}
    assert got[3] == (15.0, True)     # mean of group a
    assert got[5] == (7.0, True)      # mean of group b
    assert got[1] == (10.0, False)

    out2 = impute_nulls(df, {"grp": "mode"})
    got2 = {r["id"]: r["grp"] for r in out2.collect()}
    assert got2[6] == "a"             # 'a' count 3 beats 'b' count 2

    rows3 = [(i, float(i)) for i in range(1, 10)] + [(99, None)]
    df3 = spark.createDataFrame(rows3, "id bigint, v double")
    out3 = impute_nulls(df3, {"v": "median"})
    assert {r["v"] for r in out3.collect() if r["id"] == 99} == {5.0}


def test_impute_mode_tiebreak_is_lowest_value(spark):
    rows = [(1, "b"), (2, "b"), (3, "a"), (4, "a"), (5, None)]
    df = spark.createDataFrame(rows, "id bigint, c string")
    out = impute_nulls(df, {"c": "mode"})
    assert [r["c"] for r in out.collect() if r["id"] == 5] == ["a"]


def test_impute_constant_and_empty_group_keeps_null(spark):
    rows = [(1, "a", None), (2, "b", 3.0)]
    df = spark.createDataFrame(rows, "id bigint, grp string, v double")
    # group a has no observed value -> stays null under mean
    out = impute_nulls(df, {"v": "mean"}, by=["grp"])
    assert [r["v"] for r in out.collect() if r["id"] == 1] == [None]
    out2 = impute_nulls(df, {"v": "constant"}, constants={"v": -1.0})
    assert [r["v"] for r in out2.collect() if r["id"] == 1] == [-1.0]


def test_impute_validates_strategies(spark):
    df = spark.createDataFrame([(1, 1.0)], "id bigint, v double")
    with pytest.raises(ValueError, match="unknown strategy"):
        impute_nulls(df, {"v": "zero"})
    with pytest.raises(ValueError, match="no constants"):
        impute_nulls(df, {"v": "constant"})


# ------------------------------------------------------------ BPE encode

from feathr_spark.operators.bpe import bpe_encode_stats, bpe_merges


def _py_bpe_encode(word, merges):
    syms = list(word)
    for l, r in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_bpe_encode_matches_python_reference(spark):
    texts = ["the thin then and band banana", "rerun turner inner rent",
             "and and the the on in er re"]
    merges = [("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"),
              ("e", "r"), ("o", "n"), ("r", "e"), ("an", "d")]
    out = {r["doc_id"]: r for r in bpe_encode_stats(
        _docs(spark, texts), merges).collect()}
    for i, t in enumerate(texts):
        words = t.split()
        nb = sum(len(_py_bpe_encode(w, merges)) for w in words)
        nc = sum(len(w) for w in words)
        assert out[i]["n_words"] == len(words)
        assert out[i]["n_bpe_tokens"] == nb
        assert abs(out[i]["fertility"] - round(nc / nb, 4)) < 2e-4


def test_bpe_encode_roundtrip_with_learned_merges(spark):
    # encode with the merges bpe_merges learned from the same corpus:
    # fertility must beat the char-level baseline (1.0)
    texts = ["banana bandana banana", "bandana banana band"] * 3
    docs = _docs(spark, texts)
    learned = [(l, r) for l, r, _ in bpe_merges(docs, n_merges=4)]
    out = bpe_encode_stats(docs, learned).collect()
    assert all(r["fertility"] > 1.0 for r in out)
    # and matches the python reference under the same merge table
    for r in out:
        words = texts[r["doc_id"]].split()
        nb = sum(len(_py_bpe_encode(w, learned)) for w in words)
        assert r["n_bpe_tokens"] == nb


def test_bpe_encode_single_char_words_and_order_sensitivity(spark):
    out = {r["doc_id"]: r for r in bpe_encode_stats(
        _docs(spark, ["a b a", "ab ab"]),
        [("a", "b")]).collect()}
    assert out[0]["n_bpe_tokens"] == 3     # no adjacency inside words
    assert out[1]["n_bpe_tokens"] == 2     # each 'ab' fuses to 1
    # merge order matters: ('a','b') before ('ab','c') enables chains
    o2 = {r["doc_id"]: r["n_bpe_tokens"] for r in bpe_encode_stats(
        _docs(spark, ["abc"]), [("a", "b"), ("ab", "c")]).collect()}
    assert o2[0] == 1
