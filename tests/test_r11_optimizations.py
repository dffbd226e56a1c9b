"""Equivalence guards for the round-11 optimization fast paths.

Each optimization here replaces a query's physical pipeline with a
cheaper one that must be VALUE-IDENTICAL (the driver re-hashes every
query against its oracle): pair-counts-only basket graphs vs the full
rule table, and pagerank's no-dangling fast path vs the general loop.
"""

import pytest

from pyspark.sql import functions as F


def test_basket_pair_counts_matches_rule_table(spark):
    from feathr_spark.operators.assoc import (association_rules,
                                              basket_pair_counts)
    rows = [(o, i) for o, items in
            [(1, [3, 1, 2]), (2, [1, 2]), (3, [2, 3, 1]), (4, [9]),
             (5, [1, 2, 2, 2]), (6, [7, 8]), (7, [7, 8, 9])]
            for i in items]
    df = spark.createDataFrame(rows, "order long, item long")
    full = sorted(association_rules(df, "order", "item", min_pair_count=2)
                  .select("item_a", "item_b", "n_ab").collect())
    fast = sorted(basket_pair_counts(df, "order", "item", min_pair_count=2)
                  .collect())
    assert [tuple(r) for r in full] == [tuple(r) for r in fast]
    # max_basket gate applies identically
    big = spark.createDataFrame(
        [(1, i) for i in range(5)] + [(2, 0), (2, 1)],
        "order long, item long")
    a = sorted(association_rules(big, "order", "item", min_pair_count=1,
                                 max_basket=3)
               .select("item_a", "item_b", "n_ab").collect())
    b = sorted(basket_pair_counts(big, "order", "item", min_pair_count=1,
                                  max_basket=3).collect())
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_pagerank_no_dangling_fast_path_bit_identical(spark):
    """On a graph where every node has a positive-weight out-edge the
    fast path must reproduce the general loop bit-for-bit."""
    from feathr_spark.operators.graph import pagerank
    edges = [(1, 2, 2.0), (2, 1, 2.0), (2, 3, 1.0), (3, 2, 1.0),
             (3, 4, 5.0), (4, 3, 5.0), (1, 4, 1.0), (4, 1, 1.0)]
    df = spark.createDataFrame(edges, "src long, dst long, w double")
    slow = {r["id"]: r["rank"]
            for r in pagerank(df, weight="w", iters=3).collect()}
    fast = {r["id"]: r["rank"]
            for r in pagerank(df, weight="w", iters=3,
                              assume_no_dangling=True).collect()}
    assert slow.keys() == fast.keys()
    for k in slow:
        # bit-identical, not approximately equal
        assert slow[k] == fast[k] and str(slow[k]) == str(fast[k])


def test_cosine_and_dot_topk_matches_separate_runs(spark):
    """The shared-scoring pass must reproduce cosine_topk and dot_topk
    exactly (same rounded scores, same ranks, same tie-breaks)."""
    from feathr_spark.operators.similarity import (cosine_and_dot_topk,
                                                   cosine_topk, dot_topk)
    import math
    rows = [(i, [math.sin(i * 7.3 + j) * (1 + 0.1 * j) for j in range(8)])
            for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qs = df.where("vec_id % 5 = 0")
    ref_c = sorted(tuple(r) for r in
                   cosine_topk(df, qs, "embedding", "vec_id", k=3).collect())
    ref_d = sorted(tuple(r) for r in
                   dot_topk(df, qs, "embedding", "vec_id", k=3).collect())
    got_c, got_d = cosine_and_dot_topk(df, qs, "embedding", "vec_id", k=3)
    assert sorted(tuple(r) for r in got_c.collect()) == ref_c
    assert sorted(tuple(r) for r in got_d.collect()) == ref_d


def test_kcore_peel_matches_python_reference(spark):
    """kcore_peel survivors/degrees vs a plain-Python reference peel
    (written while evaluating — and rejecting — an alternating-key
    round variant; kept as a correctness property of the operator)."""
    from feathr_spark.operators.graph import kcore_peel
    import random
    rng = random.Random(7)
    edges = {(rng.randrange(20), rng.randrange(20)) for _ in range(60)}
    df = spark.createDataFrame(
        [(a, b) for a, b in edges if a != b], "src long, dst long")
    got = {(r["id"], r["degree"])
           for r in kcore_peel(df, k=3, rounds=4).collect()}
    # reference: plain python peel, 4 rounds
    sym = {(a, b) for a, b in edges if a != b}
    sym |= {(b, a) for a, b in sym}
    for _ in range(4):
        deg = {}
        for a, b in sym:
            deg[a] = deg.get(a, 0) + 1
        keep = {n for n, d in deg.items() if d >= 3}
        sym = {(a, b) for a, b in sym if a in keep and b in keep}
    deg = {}
    for a, b in sym:
        deg[a] = deg.get(a, 0) + 1
    assert got == set(deg.items())


def test_pagerank_no_dangling_assertion_is_callers_burden(spark):
    """Document the contract: with a dangling node the fast path keeps
    total mass ONLY via the caller's assertion — the general path is
    the correct one there (sums differ). Both directions pinned (r12,
    ADVICE r11): the general path conserves mass, and the MISUSED fast
    path measurably loses it (strictly below 1), so a future caller
    breaking the assertion fails this documented divergence instead of
    silently shipping wrong ranks."""
    from feathr_spark.operators.graph import pagerank
    df = spark.createDataFrame([(1, 2, 1.0)], "src long, dst long, w double")
    general = pagerank(df, weight="w", iters=2)
    tot = general.agg(F.sum("rank")).first()[0]
    assert tot == pytest.approx(1.0, abs=1e-9)
    misused = pagerank(df, weight="w", iters=2, assume_no_dangling=True)
    tot_fast = misused.agg(F.sum("rank")).first()[0]
    # node 2 is dangling: its mass is dropped instead of redistributed
    assert tot_fast < 1.0 - 1e-6
