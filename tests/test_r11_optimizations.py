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


def test_pagerank_no_dangling_assertion_is_callers_burden(spark):
    """Document the contract: with a dangling node the fast path keeps
    total mass ONLY via the caller's assertion — the general path is
    the correct one there (sums differ)."""
    from feathr_spark.operators.graph import pagerank
    df = spark.createDataFrame([(1, 2, 1.0)], "src long, dst long, w double")
    general = pagerank(df, weight="w", iters=2)
    tot = general.agg(F.sum("rank")).first()[0]
    assert tot == pytest.approx(1.0, abs=1e-9)
