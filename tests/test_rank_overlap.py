"""rank_overlap_rbo: truncated Rank-Biased Overlap between two runs."""

import pytest
from pyspark.sql import functions as F

from feathr_spark.operators.search import rank_overlap_rbo


def _run(spark, rows):
    return spark.createDataFrame(
        rows, "query_id bigint, neighbor_id bigint, rank bigint")


def _rbo_ref(a, b, k, p):
    # literal textbook truncated RBO
    s = 0.0
    for d in range(1, k + 1):
        o = len(set(a[:d]) & set(b[:d]))
        s += p ** (d - 1) * o / d
    return (1 - p) * s


def test_rbo_identical_runs(spark):
    rows = [(1, i, i) for i in range(1, 6)]
    out = rank_overlap_rbo(_run(spark, rows), _run(spark, rows),
                           k=5, p=0.9).collect()[0]
    assert out["n_common"] == 5
    assert out["rbo"] == pytest.approx(
        _rbo_ref([1, 2, 3, 4, 5], [1, 2, 3, 4, 5], 5, 0.9), abs=1e-4)


def test_rbo_disjoint_runs_score_zero(spark):
    a = [(1, i, i) for i in range(1, 6)]
    b = [(1, i + 100, i) for i in range(1, 6)]
    out = rank_overlap_rbo(_run(spark, a), _run(spark, b),
                           k=5, p=0.9).collect()[0]
    assert out["rbo"] == 0.0 and out["n_common"] == 0


def test_rbo_matches_textbook_formula_on_partial_overlap(spark):
    la, lb = [10, 20, 30, 40, 50], [30, 10, 60, 20, 70]
    a = [(1, item, r + 1) for r, item in enumerate(la)]
    b = [(1, item, r + 1) for r, item in enumerate(lb)]
    out = rank_overlap_rbo(_run(spark, a), _run(spark, b),
                           k=5, p=0.9).collect()[0]
    assert out["rbo"] == pytest.approx(_rbo_ref(la, lb, 5, 0.9), abs=1e-4)
    assert out["n_common"] == 3  # {10, 20, 30}


def test_rbo_top_heavy_weighting(spark):
    # agreement only at rank 1 beats agreement only at rank 5
    top = [(1, 99, 1)] + [(1, i, r) for r, i in enumerate([2, 3, 4, 5], 2)]
    bot = [(1, i, r) for r, i in enumerate([6, 7, 8, 9], 1)] + [(1, 99, 5)]
    other_top = [(1, 99, 1)] + [(1, i, r) for r, i in
                                enumerate([12, 13, 14, 15], 2)]
    other_bot = [(1, i, r) for r, i in enumerate([16, 17, 18, 19], 1)] \
        + [(1, 99, 5)]
    hi = rank_overlap_rbo(_run(spark, top), _run(spark, other_top),
                          k=5, p=0.9).collect()[0]["rbo"]
    lo = rank_overlap_rbo(_run(spark, bot), _run(spark, other_bot),
                          k=5, p=0.9).collect()[0]["rbo"]
    assert hi > lo > 0


def test_rbo_query_in_one_run_only_scores_zero(spark):
    a = [(1, i, i) for i in range(1, 6)] + [(2, i, i) for i in range(1, 6)]
    b = [(1, i, i) for i in range(1, 6)]
    out = {r["query_id"]: r for r in
           rank_overlap_rbo(_run(spark, a), _run(spark, b),
                            k=5, p=0.9).collect()}
    assert out[2]["rbo"] == 0.0 and out[2]["n_common"] == 0
    # truncated (unextrapolated) RBO of identical lists = 1 - p^k
    assert out[1]["rbo"] == pytest.approx(1 - 0.9 ** 5, abs=1e-4)
