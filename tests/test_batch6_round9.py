"""Round-9 batch-6 operators: Zipf rank-frequency fit, compaction
planning, lexical-richness profiling."""

import math

import pytest
from pyspark.sql import functions as F

from feathr_spark.operators.layout import compaction_plan
from feathr_spark.operators.lm import zipf_fit
from feathr_spark.operators.text import lexical_richness


# ------------------------------------------------------------- zipf_fit

def test_zipf_fit_recovers_planted_power_law(spark):
    # plant an exact Zipf corpus: term_r appears round(1000/r) times
    rows = []
    for r in range(1, 21):
        rows.extend((0, f"w{r:02d}") for _ in range(round(1000 / r)))
    df = (spark.createDataFrame(rows, "doc_id bigint, term string")
          .groupBy("doc_id")
          .agg(F.concat_ws(" ", F.collect_list("term")).alias("text")))
    out = zipf_fit(df, top_n=20).collect()[0]
    assert out["n_terms"] == 20
    assert out["slope"] == pytest.approx(-1.0, abs=0.02)
    assert out["r2"] > 0.999
    # intercept ~ ln(1000)
    assert out["intercept"] == pytest.approx(math.log(1000), abs=0.05)


def test_zipf_fit_flat_corpus_has_zero_slope(spark):
    # every term equally frequent -> ln(tf) constant -> slope 0, r2 0/0
    text = " ".join(f"t{i}" for i in range(30)) + " "
    df = spark.createDataFrame([(0, text * 3)], "doc_id bigint, text string")
    out = zipf_fit(df, top_n=30).collect()[0]
    assert out["slope"] == 0.0
    assert out["r2"] is None  # undefined on a zero-variance head


def test_zipf_fit_partitioning_invariance(spark):
    rows = [(i, f"alpha beta gamma w{i % 13} w{i % 7}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    a = zipf_fit(df, top_n=15).collect()[0]
    b = zipf_fit(df.repartition(11), top_n=15).collect()[0]
    assert tuple(a) == tuple(b)


# ------------------------------------------------------ compaction_plan

def test_compaction_plan_bins_close_at_target(spark):
    # sizes 60,50,40,30,20 target 100: cum_before 0,60,110,150,180
    # -> bins 0,0,1,1,1
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate([60, 50, 40, 30, 20])],
        "fid bigint, sz bigint")
    out = {r["bin_id"]: r for r in
           compaction_plan(df, "sz", "fid", target_bytes=100).collect()}
    assert out[0]["n_items"] == 2 and out[0]["bin_bytes"] == 110
    assert out[1]["n_items"] == 3 and out[1]["bin_bytes"] == 90
    # every bin except the last holds >= target
    assert out[0]["bin_bytes"] >= 100


def test_compaction_plan_bins_within_one_item_of_target(spark):
    import random
    rng = random.Random(7)
    sizes = [(i, rng.randint(1, 5000)) for i in range(300)]
    df = spark.createDataFrame(sizes, "fid bigint, sz bigint")
    rows = sorted(compaction_plan(df, "sz", "fid",
                                  target_bytes=20000).collect(),
                  key=lambda r: r["bin_id"])
    max_sz = max(s for _, s in sizes)
    # boundary-overshoot bound: every non-final bin within one item of
    # the target on both sides
    for r in rows[:-1]:
        assert 20000 - max_sz <= r["bin_bytes"] <= 20000 + max_sz
    # the plan is a partition: no byte lost or duplicated
    total = sum(r["bin_bytes"] for r in rows)
    assert total == df.agg(F.sum("sz")).collect()[0][0]
    assert sum(r["n_items"] for r in rows) == 300


def test_compaction_plan_is_per_group_independent(spark):
    df = spark.createDataFrame(
        [("a", 1, 90), ("a", 2, 80), ("b", 3, 90), ("b", 4, 80)],
        "src string, fid bigint, sz bigint")
    out = compaction_plan(df, "sz", "fid", by=["src"],
                          target_bytes=100).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["src"], []).append((r["bin_id"], r["n_items"],
                                                r["bin_bytes"]))
    assert sorted(by_src["a"]) == sorted(by_src["b"])


# ----------------------------------------------------- lexical_richness

def test_lexical_richness_hand_computed(spark):
    # group g: tokens [a a a b c] -> N=5 V=3 hapax=2 sq=9+1+1=11
    # K = 1e4*(11-5)/25 = 2400
    df = spark.createDataFrame([("g", "a a a b c")],
                               "source string, text string")
    r = lexical_richness(df).collect()[0]
    assert r["n_tokens"] == 5 and r["n_types"] == 3 and r["n_hapax"] == 2
    assert r["ttr"] == pytest.approx(0.6)
    assert r["hapax_ratio"] == pytest.approx(2 / 3, abs=1e-4)
    assert r["yule_k"] == pytest.approx(2400.0)


def test_lexical_richness_repetitive_source_scores_higher_k(spark):
    df = spark.createDataFrame(
        [("boiler", "the same line " * 50),
         ("varied", " ".join(f"w{i}" for i in range(150)))],
        "source string, text string")
    out = {r["source"]: r for r in lexical_richness(df).collect()}
    assert out["boiler"]["yule_k"] > out["varied"]["yule_k"]
    assert out["varied"]["ttr"] > out["boiler"]["ttr"]
    assert out["varied"]["hapax_ratio"] == pytest.approx(1.0)


# ------------------------------------------------------- nelson_aalen

def test_nelson_aalen_hand_computed(spark):
    from feathr_spark.operators.survival import nelson_aalen
    # durations: events at t=1 (n=4), t=2 (n=3); censored at t=3 (n=2)
    rows = [(1, True), (2, True), (3, False), (3, False)]
    df = spark.createDataFrame(rows, "duration bigint, event boolean")
    out = {r["duration"]: r for r in
           nelson_aalen(df).collect()}
    assert out[1]["cum_hazard"] == pytest.approx(1 / 4)
    assert out[2]["cum_hazard"] == pytest.approx(1 / 4 + 1 / 3)
    assert out[3]["cum_hazard"] == pytest.approx(1 / 4 + 1 / 3)
    assert out[2]["fh_survival"] == pytest.approx(
        math.exp(-(1 / 4 + 1 / 3)))
    assert out[1]["var_hazard"] == pytest.approx(1 / 16)
    assert out[3]["n_risk"] == 2 and out[3]["n_event"] == 0


def test_nelson_aalen_tracks_km_from_above(spark):
    from feathr_spark.operators.survival import (kaplan_meier,
                                                 nelson_aalen)
    rows = [(d, d % 3 != 0) for d in range(1, 40)]
    df = spark.createDataFrame(rows, "duration bigint, event boolean")
    km = {r["duration"]: r["survival"] for r in kaplan_meier(df).collect()}
    na = {r["duration"]: r["fh_survival"] for r in
          nelson_aalen(df).collect()}
    # Fleming-Harrington >= Kaplan-Meier everywhere (exp(-x) >= 1-x)
    for d in km:
        assert na[d] >= km[d] - 1e-12
