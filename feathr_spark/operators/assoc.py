"""Market-basket co-occurrence and association rules.

The classic affinity analytics over (basket, item) rows — which items
appear together more often than chance. The reference has no analytics
operators at all (it delegates everything to Spark SQL expressions,
``/root/reference/feathr-rs/src/model.rs:248-253``); this is engine-side
because pair generation and the support/confidence/lift algebra are not
expressible as a row-level expression.

Scale design: pairs are generated ROW-LOCALLY from each basket's sorted
distinct-item array with a higher-order-function double-transform — no
self-join of the items table, so the only data-sized shuffles are the
basket groupBy and the pair count. Per-basket pair fan-out is
``k·(k−1)/2`` for a k-item basket, so ``max_basket`` (default 100) drops
degenerate mega-baskets BEFORE the explosion (a 10⁶-item basket would
emit 5·10¹¹ pairs — the hot-gram lesson from the contamination
operator). ``min_pair_count`` prunes the rule table at the count stage,
before the per-item statistics attach.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _basket_frame(df: DataFrame, basket_col: str, item_col: str,
                  max_basket: int) -> DataFrame:
    """Shared basket collapse: one groupBy(basket) collecting the sorted
    distinct item array, mega-baskets dropped BEFORE any explosion."""
    items = (df.select(F.col(basket_col).alias("__bk"),
                       F.col(item_col).alias("__it"))
             .where(F.col("__it").isNotNull() & F.col("__bk").isNotNull()))
    return (items.groupBy("__bk")
            .agg(F.sort_array(F.collect_set("__it")).alias("__arr"))
            .where(F.size("__arr") <= int(max_basket))
            .where(F.size("__arr") >= 1))


def _pair_counts_of(baskets: DataFrame, min_pair_count: int) -> DataFrame:
    """Row-local pair explosion + one (a, b) count — the shared pair
    stage of :func:`association_rules` and :func:`basket_pair_counts`
    (identical expressions, so n_ab is bit-identical between them)."""
    arr = F.col("__arr")
    pairs_expr = F.flatten(F.transform(
        arr,
        lambda x, i: F.transform(
            F.slice(arr, i + 2, F.size(arr)),
            lambda y: F.struct(x.alias("a"), y.alias("b")))))
    return (baskets
            .select(F.explode(pairs_expr).alias("p"))
            .groupBy(F.col("p.a").alias("item_a"),
                     F.col("p.b").alias("item_b"))
            .agg(F.count("*").alias("n_ab"))
            .where(F.col("n_ab") >= int(min_pair_count)))


def basket_pair_counts(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 2,
    max_basket: int = 100,
) -> DataFrame:
    """Co-occurrence pair counts ONLY: (item_a, item_b, n_ab) with
    ``item_a < item_b`` — the graph-edge fast path of
    :func:`association_rules`.

    The full rule table inner-joins per-item counts and broadcasts the
    basket total onto every pair; callers that feed a GRAPH operator
    (pagerank / components / triangles / degree stats) use only the
    pair list, but Catalyst cannot prune an inner join away (it changes
    cardinality as far as the optimizer knows), so they paid a second
    full basket explosion (the per-item count pass) plus two joins for
    columns they drop. This entry point shares the basket/pair
    expressions with the rule table — n_ab is bit-identical — and
    skips everything else. One basket groupBy + one pair count; no
    persist needed (the basket frame has exactly one consumer).
    """
    if min_pair_count < 1:
        raise ValueError("basket_pair_counts: min_pair_count must be >= 1")
    if max_basket < 2:
        raise ValueError("basket_pair_counts: max_basket must be >= 2")
    baskets = _basket_frame(df, basket_col, item_col, max_basket)
    return _pair_counts_of(baskets, min_pair_count).select(
        "item_a", "item_b", F.col("n_ab").cast("bigint").alias("n_ab"))


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 2,
    max_basket: int = 100,
) -> DataFrame:
    """Item-pair association rules: for every unordered item pair
    {a, b} (canonical a < b) co-occurring in at least
    ``min_pair_count`` baskets, report

    - ``n_ab`` / ``support`` — co-occurrence count and its fraction of
      all baskets,
    - ``conf_a_b`` = P(b | a) and ``conf_b_a`` = P(a | b),
    - ``lift`` = support / (P(a)·P(b)) — > 1 means the pair co-occurs
      more than independent items would.

    Multiplicity inside a basket is ignored (buying 3 of the same part
    is one incidence) and NULL items are dropped. Baskets with more
    than ``max_basket`` distinct items are EXCLUDED from every
    statistic (item counts, basket count, pairs) so the reported
    fractions stay mutually consistent; exclusion is loud in ``n_baskets``.

    Plan: ONE groupBy(basket) collects the sorted distinct item array;
    pairs explode row-locally (HOF double transform — no self-join);
    one groupBy(a, b) counts pairs; per-item counts and the single-row
    basket total re-aggregate the SAME basket-array frame and attach by
    item-keyed joins (AQE decides broadcast vs shuffle) and a broadcast
    1-row cross. Output: (item_a, item_b, n_ab, n_a, n_b, n_baskets,
    support, conf_a_b, conf_b_a, lift).
    """
    if min_pair_count < 1:
        raise ValueError("association_rules: min_pair_count must be >= 1")
    if max_basket < 2:
        raise ValueError("association_rules: max_basket must be >= 2")
    # this frame fans out into pairs / item counts / basket total —
    # persist so the basket aggregation runs once, not three times
    baskets = _basket_frame(df, basket_col, item_col, max_basket).persist()

    # row-local pair explosion: for each i, pair arr[i] with arr[i+1:]
    pair_counts = _pair_counts_of(baskets, min_pair_count)

    item_counts = (baskets.select(F.explode("__arr").alias("__it"))
                   .groupBy("__it").agg(F.count("*").alias("__in")))
    total = baskets.agg(F.count(F.lit(1)).alias("__nb"))

    out = (pair_counts
           .join(item_counts.select(F.col("__it").alias("item_a"),
                                    F.col("__in").alias("n_a")), "item_a")
           .join(item_counts.select(F.col("__it").alias("item_b"),
                                    F.col("__in").alias("n_b")), "item_b")
           .crossJoin(F.broadcast(total)))
    nb = F.col("__nb").cast("double")
    from ._cache import attach_intermediates
    out = out.select(
        "item_a", "item_b",
        F.col("n_ab").cast("bigint").alias("n_ab"),
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.col("__nb").cast("bigint").alias("n_baskets"),
        (F.col("n_ab") / nb).alias("support"),
        (F.col("n_ab") / F.col("n_a").cast("double")).alias("conf_a_b"),
        (F.col("n_ab") / F.col("n_b").cast("double")).alias("conf_b_a"),
        (F.col("n_ab") * nb
         / (F.col("n_a").cast("double") * F.col("n_b"))).alias("lift"))
    # callers done with the rule table release the basket cache
    # deterministically (see _cache docstring)
    return attach_intermediates(out, [baskets])
