"""Keyword search over a document corpus: BM25 scoring + top-k retrieval.

The reference's expression DSL delegates scalar work to Spark SQL
(`/root/reference/feathr-rs/src/model.rs:248-253`); ranked retrieval is an
engine extension a training-data pipeline needs (e.g. pulling candidate
documents for a topic mix, or grading corpus relevance against probe
queries).

Design for scale: term frequencies are computed ROW-LOCALLY with builtin
higher-order functions (the query term list is a handful of literals — no
corpus-side explode, no (doc, term) shuffle). The only shuffles are a
single-row corpus-statistics aggregate (document count, average length,
per-term document frequencies) that is broadcast back, and the global
top-k, which compiles to TakeOrderedAndProject (partition-local heads,
no full sort). Every score is a codegen'd expression.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _norm_tokens(col: Column) -> Column:
    """Whitespace tokens of lowercased, whitespace-normalized text — the
    same normalization as the dedup/text operators."""
    return F.split(F.lower(F.trim(F.regexp_replace(col, r"\s+", " "))), " ")


def bm25_topk(
    df: DataFrame,
    query_terms: List[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    round_dp: int = 4,
) -> DataFrame:
    """Top-``k`` documents by Okapi BM25 for a bag of query terms.

    score(d) = Σ_t idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1−b+b·|d|/avgdl))
    with the Lucene-standard non-negative idf
    ln(1 + (N − df + 0.5)/(df + 0.5)).

    Physical plan: one narrow projection computes per-row token count and
    the per-term tfs (array of ``size(filter(tokens, = term))`` — query
    terms are literals, so this is row-local and codegen'd); one
    single-row aggregate derives N, avgdl and each term's document
    frequency; that row is broadcast back (BroadcastNestedLoopJoin over
    exactly one row) and the score is a flat arithmetic expression. The
    final top-k is ``orderBy().limit(k)`` = TakeOrderedAndProject.
    Scores are rounded BEFORE ranking (round-before-rank convention, ties
    broken by id) so rankings are reproducible across engines.

    Output: (``id_col``, rank, score), rank 1-based.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = [t.lower() for t in query_terms]
    toks = df.select(F.col(id_col).alias("__id"),
                     _norm_tokens(F.col(text_col)).alias("__w"))
    def _eq(term):
        # a one-parameter lambda per term: a two-parameter lambda would be
        # interpreted by Spark as the (element, index) form
        return lambda x: x == F.lit(term)

    tf_cols = [
        F.size(F.filter("__w", _eq(t))).cast("double").alias(f"__tf{i}")
        for i, t in enumerate(terms)
    ]
    per_doc = toks.select("__id", F.size("__w").cast("double").alias("__dl"),
                          *tf_cols)
    stats = per_doc.agg(
        F.count("*").cast("double").alias("__n"),
        F.avg("__dl").alias("__avgdl"),
        *[F.sum((F.col(f"__tf{i}") > 0).cast("double")).alias(f"__df{i}")
          for i in range(len(terms))])
    scored = per_doc.crossJoin(F.broadcast(stats))
    score = F.lit(0.0)
    for i in range(len(terms)):
        idf = F.log(
            F.lit(1.0) + (F.col("__n") - F.col(f"__df{i}") + F.lit(0.5))
            / (F.col(f"__df{i}") + F.lit(0.5)))
        tf = F.col(f"__tf{i}")
        denom = tf + F.lit(k1) * (F.lit(1.0 - b)
                                  + F.lit(b) * F.col("__dl") / F.col("__avgdl"))
        score = score + idf * tf * F.lit(k1 + 1.0) / denom
    ranked = (scored
              .select(F.col("__id"),
                      F.round(score, round_dp).cast("double").alias("score"))
              .orderBy(F.col("score").desc(), F.col("__id").asc())
              .limit(k))
    # the rank window is unpartitioned but runs on the ≤ k rows surviving
    # TakeOrderedAndProject — the bounded form the plan guard allows
    w = F.row_number().over(
        Window.orderBy(F.col("score").desc(), F.col("__id").asc()))
    return ranked.select(F.col("__id").alias(id_col),
                         w.cast("bigint").alias("rank"), "score")


def tf_idf_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
) -> DataFrame:
    """Corpus TF-IDF table: one row per (doc, term) with tf, df and
    tf·idf (idf = ln((1+N)/(1+df)) + 1, the smoothed scikit-learn form).

    Plan shape: explode tokens → ``groupBy(doc, term)`` tf counts (one
    shuffle, map-side combined) → per-term document frequencies reuse the
    SAME (term)-keyed aggregation (second small shuffle on term only) →
    broadcast-join the tiny (term, df) frame back. N arrives as a
    single-row broadcast aggregate, never a driver collect.

    Output: (``id_col``, term, tf, df, tf_idf).
    """
    toks = df.select(F.col(id_col).alias("__id"),
                     F.explode(_norm_tokens(F.col(text_col))).alias("term"))
    tf = toks.groupBy("__id", "term").agg(
        F.count("*").cast("bigint").alias("tf"))
    dfreq = (tf.groupBy("term")
             .agg(F.count("*").cast("bigint").alias("df"))
             .where(F.col("df") >= min_df))
    n_docs = df.agg(F.countDistinct(F.col(id_col)).cast("double").alias("__n"))
    out = (tf.join(F.broadcast(dfreq), "term")
           .crossJoin(F.broadcast(n_docs)))
    tfidf = F.col("tf") * (F.log((F.lit(1.0) + F.col("__n"))
                                 / (F.lit(1.0) + F.col("df"))) + F.lit(1.0))
    return out.select(F.col("__id").alias(id_col), "term", "tf", "df",
                      F.round(tfidf, 4).cast("double").alias("tf_idf"))


def rrf_fuse(
    rankings: List[DataFrame],
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    by: List[str] = None,
    k: int = 60,
    top_k: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion of N rankings (Cormack et al. 2009): each
    list contributes ``1 / (k + rank)`` per document, fused score =
    the sum — the standard combiner for HYBRID retrieval (BM25 +
    vector top-k), robust because it uses only ranks, never the
    incomparable raw scores. ``by`` carries per-query columns when the
    rankings are per-query frames.

    Scale: the inputs are already top-k-bounded (that is what a
    ranking IS), so every frame here is (queries × k × n_lists)-sized
    — the union/groupBy/rank window all operate on retrieval results,
    not the corpus. The rank window is partitioned by the query
    columns (or a constant for a single global ranking — the frame is
    bounded by construction either way). Round-before-rank + doc-id
    tie-break keep the fused order engine-portable.

    Output: (by..., doc_id, rrf_score, rank) with rank <= top_k.
    """
    if not rankings:
        raise ValueError("rrf_fuse: need at least one ranking")
    if k < 1 or top_k < 1:
        raise ValueError("rrf_fuse: k and top_k must be >= 1")
    keys = list(by or [])
    parts = [r.select(*keys, F.col(doc_col).alias("__doc"),
                      (F.lit(1.0) / (F.lit(int(k)) + F.col(rank_col)))
                      .alias("__w"))
             for r in rankings]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    fused = (u.groupBy(*keys, "__doc")
             .agg(F.sum("__w").alias("__score"),
                  F.count("*").alias("__lists")))
    w = Window.partitionBy(*(keys or [F.lit(0)])).orderBy(
        F.round(F.col("__score"), 6).desc(), F.col("__doc").asc())
    return (fused.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= int(top_k))
            .select(*keys, F.col("__doc").alias(doc_col),
                    F.col("__score").alias("rrf_score"),
                    F.col("__lists").cast("int").alias("n_lists"),
                    "rank"))


def ndcg_at_k(
    df: DataFrame,
    group_col: str,
    item_col: str,
    score_col: str,
    rel_col: str,
    k: int = 10,
) -> DataFrame:
    """Ranking-quality evaluation: nDCG@k of the ``score_col`` ordering
    against graded ``rel_col`` relevance, per group.

    DCG@k = sum over the top-k scored items of (2^rel - 1)/log2(rank+1);
    IDCG@k is the same sum under the ideal (relevance-sorted) order;
    nDCG = DCG/IDCG (NULL when the group has no positive relevance).
    Ties break on ``item_col`` ascending in BOTH orderings, so the
    statistic is deterministic at any parallelism.

    Plan: two row_number windows share one hash partitioning on the
    group key (rank by score, rank by relevance), each filtered to k
    rows per group map-side; the final fold is group-sized. No global
    sort anywhere.
    """
    if k < 1:
        raise ValueError("ndcg_at_k: k must be >= 1")
    g = F.col(group_col)
    d = (df.where(g.isNotNull())
           .select(g.alias("__g"), F.col(item_col).alias("__i"),
                   F.col(score_col).cast("double").alias("__s"),
                   F.col(rel_col).cast("double").alias("__r")))
    w_rank = Window.partitionBy("__g").orderBy(F.col("__s").desc(),
                                               F.col("__i").asc())
    w_ideal = Window.partitionBy("__g").orderBy(F.col("__r").desc(),
                                                F.col("__i").asc())
    ranked = d.select(
        "__g", "__r",
        F.row_number().over(w_rank).alias("__rank"),
        F.row_number().over(w_ideal).alias("__irank"))
    gain = F.pow(F.lit(2.0), F.col("__r")) - 1.0
    dcg_term = F.when(F.col("__rank") <= k,
                      gain / F.log2(F.col("__rank") + 1.0)).otherwise(0.0)
    idcg_term = F.when(F.col("__irank") <= k,
                       gain / F.log2(F.col("__irank") + 1.0)) \
        .otherwise(0.0)
    out = (ranked.groupBy("__g")
           .agg(F.sum(dcg_term).alias("__dcg"),
                F.sum(idcg_term).alias("__idcg"),
                F.count(F.lit(1)).alias("__n")))
    ndcg = F.when(F.col("__idcg") > 0, F.col("__dcg") / F.col("__idcg"))
    return out.select(
        F.col("__g").alias(group_col),
        F.col("__n").cast("bigint").alias("n_items"),
        F.col("__dcg").cast("double").alias("dcg"),
        F.col("__idcg").cast("double").alias("idcg"),
        ndcg.cast("double").alias("ndcg"))


def doc_keywords(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    min_df: int = 1,
) -> DataFrame:
    """Top-k TF-IDF keywords per document — the standard cheap
    keyword/tag extractor for corpus exploration and weak labeling.

    Builds on :func:`tf_idf_table` (one (doc, term) shuffle + broadcast
    df frame); the per-doc top-k is a row_number window partitioned by
    document — parallel across docs, each task ranks only one doc's
    terms. Ties (same 4-dp score) break on term ascending so the
    keyword set is deterministic on any engine.

    Output: (``id_col``, term, tf_idf, rank) with rank 1..k.
    """
    if k < 1:
        raise ValueError("doc_keywords: k must be >= 1")
    cells = tf_idf_table(df, text_col, id_col, min_df)
    w = Window.partitionBy(id_col).orderBy(F.col("tf_idf").desc(),
                                           F.col("term").asc())
    return (cells.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(id_col, "term", "tf_idf",
                    F.col("rank").cast("bigint").alias("rank")))


def retrieval_metrics(
    hits: DataFrame,
    rel_totals: DataFrame,
    group_col: str = "query_id",
    rank_col: str = "rank",
    rel_col: str = "is_rel",
    k: int = 10,
    round_dp: int = 4,
) -> DataFrame:
    """Classic IR evaluation over a ranked run: per query, reciprocal
    rank, precision@k, average-precision@k, and recall@k — the metric
    quartet behind MRR/MAP leaderboards, computed engine-portably.

    ``hits``: one row per retrieved (query, rank, is_rel) with ranks
    1-based and unique per query. ``rel_totals``: (group_col, n_rel) —
    the size of each query's full relevant set (the recall and AP
    denominators; the run alone cannot know what it failed to
    retrieve). AP@k = Σ_{i≤k, rel_i} P@i / min(n_rel, k).

    INNER-join contract (ADVICE r9): the output contains exactly the
    queries present in BOTH inputs — a query in ``hits`` with no
    ``rel_totals`` row (or vice versa) is silently absent, not scored
    as zero. Callers evaluating a fixed query set should build
    ``rel_totals`` for every query (n_rel ≥ 1 by definition of a
    judged query) and treat a short output as the missing-judgments
    signal.

    Determinism: every metric is a ratio of exact integers; the AP
    numerator sums per-rank precisions quantized to integer nano-units
    (the micro-nat convention, 3 digits finer since P@i ≤ 1), so no
    float summation order exists anywhere.

    Plan: one group-keyed aggregate over the (per-query, ≤k) hit rows +
    a broadcast of the query-sized totals frame. Output per query:
    (group_col, n_rel, rr, p_at_k, ap_at_k, recall_at_k).
    """
    from pyspark.sql import Window
    if k < 1:
        raise ValueError("retrieval_metrics: k must be >= 1")
    g = F.col(group_col)
    d = hits.select(g.alias("__g"),
                    F.col(rank_col).cast("bigint").alias("__rank"),
                    F.col(rel_col).cast("boolean").alias("__rel")) \
        .where(F.col("__rank") <= k)
    w = (Window.partitionBy("__g").orderBy("__rank")
         .rowsBetween(Window.unboundedPreceding, 0))
    cum_rel = F.sum(F.when(F.col("__rel"), 1).otherwise(0)).over(w)
    staged = d.select(
        "__g", "__rank", "__rel",
        # nano-quantized P@i term, counted only at relevant ranks
        F.when(F.col("__rel"),
               F.round(cum_rel.cast("double") / F.col("__rank")
                       * F.lit(1e9), 0).cast("bigint"))
        .otherwise(F.lit(0)).alias("__ap_term"))
    per = (staged.groupBy("__g")
           .agg(F.min(F.when(F.col("__rel"), F.col("__rank")))
                .alias("__first_rel"),
                F.sum(F.when(F.col("__rel"), 1).otherwise(0))
                .cast("bigint").alias("__hits_rel"),
                F.sum("__ap_term").alias("__ap_nano")))
    tot = rel_totals.select(g.alias("__g"),
                            F.col("n_rel").cast("bigint").alias("n_rel"))
    j = per.join(F.broadcast(tot), "__g")
    nudge = F.lit(10.0 ** -(round_dp + 5))
    ap_den = F.least(F.col("n_rel"), F.lit(k))
    return j.select(
        F.col("__g").alias(group_col), "n_rel",
        F.round(F.when(F.col("__first_rel").isNotNull(),
                       F.lit(1.0) / F.col("__first_rel"))
                .otherwise(F.lit(0.0)) + nudge, round_dp)
        .cast("double").alias("rr"),
        F.round(F.col("__hits_rel").cast("double") / F.lit(k) + nudge,
                round_dp).cast("double").alias("p_at_k"),
        F.round(F.when(ap_den > 0,
                       F.col("__ap_nano").cast("double") / F.lit(1e9)
                       / ap_den).otherwise(F.lit(0.0)) + nudge, round_dp)
        .cast("double").alias("ap_at_k"),
        F.round(F.when(F.col("n_rel") > 0,
                       F.col("__hits_rel").cast("double")
                       / F.col("n_rel")).otherwise(F.lit(0.0)) + nudge,
                round_dp).cast("double").alias("recall_at_k"))


def rank_overlap_rbo(
    run_a: DataFrame,
    run_b: DataFrame,
    k: int,
    p: float = 0.9,
    group_col: str = "query_id",
    item_col: str = "neighbor_id",
    rank_col: str = "rank",
    round_dp: int = 4,
) -> DataFrame:
    """Truncated Rank-Biased Overlap (Webber, Moffat & Zobel, TOIS'10)
    between two ranked runs: RBO@k = (1−p)·Σ_{d=1..k} p^{d−1}·|A_d ∩
    B_d|/d, the rank-aware alternative to set recall for comparing two
    retrieval strategies (an item the runs agree on at depth 1 counts
    far more than agreement at depth k). The standard readout when
    swapping an ANN candidate stage: how much of the ranking, not just
    the set, survived.

    Distributed form: an item at ranks (ra, rb) joins every prefix
    depth d >= max(ra, rb), so its total contribution is the constant
    W(m) = Σ_{d=m..k} p^{d−1}/d with m = max(ra, rb) — the k weights
    are PRECOMPUTED PYTHON LITERALS (identical on every engine) and
    quantized to integer nano-units before the per-query sum, so the
    whole statistic is exact integer arithmetic after one equi-join of
    the two k-row-per-query runs. Queries in either run missing from
    the other score 0 agreement (RBO 0.0) rather than dropping out.

    Output per query: (group_col, n_common, rbo).
    """
    if k < 1:
        raise ValueError("rank_overlap_rbo: k must be >= 1")
    if not (0.0 < p < 1.0):
        raise ValueError("rank_overlap_rbo: p must be in (0, 1)")
    # W(m) = sum_{d=m..k} p^(d-1)/d, nano-quantized literals
    weights = []
    for m in range(1, k + 1):
        w = sum(p ** (d - 1) / d for d in range(m, k + 1))
        weights.append(int(round(w * 1e9)))

    def prep(df, side):
        return df.select(F.col(group_col).alias("__g"),
                         F.col(item_col).alias("__i"),
                         F.col(rank_col).cast("int").alias(f"__r{side}")) \
            .where(F.col(f"__r{side}") <= k)

    a, b = prep(run_a, "a"), prep(run_b, "b")
    joined = a.join(b, ["__g", "__i"])
    m = F.greatest(F.col("__ra"), F.col("__rb"))
    wexpr = F.lit(weights[k - 1])
    for mm in range(k - 1, 0, -1):
        wexpr = F.when(m == mm, F.lit(weights[mm - 1])).otherwise(wexpr)
    per = (joined.groupBy("__g")
           .agg(F.count("*").cast("bigint").alias("n_common"),
                F.sum(wexpr).alias("__w_nano")))
    # keep every query either run ranked (zero-agreement queries score 0)
    qs = a.select("__g").union(b.select("__g")).distinct()
    out = qs.join(per, "__g", "left")
    nudge = F.lit(10.0 ** -(round_dp + 5))
    return out.select(
        F.col("__g").alias(group_col),
        F.coalesce(F.col("n_common"), F.lit(0)).cast("bigint")
        .alias("n_common"),
        F.round(F.lit(1.0 - p)
                * F.coalesce(F.col("__w_nano"), F.lit(0)).cast("double")
                / F.lit(1e9) + nudge, round_dp)
        .cast("double").alias("rbo"))
