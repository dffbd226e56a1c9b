"""retrieval_metrics: the IR evaluation quartet (RR, P@k, AP@k,
recall@k) over a ranked run with known relevance."""

import pytest
from pyspark.sql import functions as F

from feathr_spark.operators.search import retrieval_metrics


def _run(spark, rows):
    hits = spark.createDataFrame(rows, "query_id bigint, rank bigint, "
                                       "is_rel boolean")
    return hits


def _totals(spark, pairs):
    return spark.createDataFrame(pairs, "query_id bigint, n_rel bigint")


def test_metrics_hand_computed_textbook_case(spark):
    # run: rel at ranks 1, 3, 5 of 5; universe has 4 relevant docs
    hits = _run(spark, [(1, r, r in (1, 3, 5)) for r in range(1, 6)])
    out = retrieval_metrics(hits, _totals(spark, [(1, 4)]), k=5) \
        .collect()[0]
    assert out["rr"] == 1.0
    assert out["p_at_k"] == pytest.approx(0.6)
    # AP@5 = (1/1 + 2/3 + 3/5) / min(4,5) = 2.2667/4 = 0.5667
    assert out["ap_at_k"] == pytest.approx((1 + 2 / 3 + 3 / 5) / 4,
                                           abs=1e-4)
    assert out["recall_at_k"] == pytest.approx(0.75)


def test_metrics_no_relevant_hit(spark):
    hits = _run(spark, [(1, r, False) for r in range(1, 6)])
    out = retrieval_metrics(hits, _totals(spark, [(1, 3)]), k=5) \
        .collect()[0]
    assert out["rr"] == 0.0 and out["p_at_k"] == 0.0
    assert out["ap_at_k"] == 0.0 and out["recall_at_k"] == 0.0


def test_metrics_first_hit_at_rank_k(spark):
    hits = _run(spark, [(1, r, r == 4) for r in range(1, 6)])
    out = retrieval_metrics(hits, _totals(spark, [(1, 1)]), k=5) \
        .collect()[0]
    assert out["rr"] == pytest.approx(0.25)
    # AP@5 = (1/4) / min(1,5) = 0.25; recall = 1/1
    assert out["ap_at_k"] == pytest.approx(0.25)
    assert out["recall_at_k"] == 1.0


def test_metrics_ignores_ranks_beyond_k(spark):
    hits = _run(spark, [(1, 1, False), (1, 2, True), (1, 7, True)])
    out = retrieval_metrics(hits, _totals(spark, [(1, 2)]), k=5) \
        .collect()[0]
    assert out["p_at_k"] == pytest.approx(0.2)   # only rank 2 counts
    assert out["recall_at_k"] == pytest.approx(0.5)


def test_metrics_partitioning_invariance(spark):
    rows = [(q, r, (q + r) % 3 == 0) for q in range(1, 30)
            for r in range(1, 11)]
    totals = [(q, 5) for q in range(1, 30)]
    a = sorted(map(tuple, retrieval_metrics(
        _run(spark, rows), _totals(spark, totals), k=10).collect()))
    b = sorted(map(tuple, retrieval_metrics(
        _run(spark, rows).repartition(13), _totals(spark, totals),
        k=10).collect()))
    assert a == b
