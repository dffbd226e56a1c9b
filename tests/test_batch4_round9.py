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
