"""Multinomial Naive Bayes text classification — the classic quality /
language / domain classifier of large-corpus curation pipelines (a
CCNet-style fastText stand-in that needs nothing but token counts).

Reference parity note: the reference engine exposes no classifier; this
is part of the LLM-training-data extension surface (same family as
operators/lm.py CCNet scoring). Algorithm is textbook add-one-smoothed
multinomial NB (McCallum & Nigam, AAAI-98 workshop).

Scale shape: training is two token-keyed aggregates (per-(class, term)
counts and per-(doc, term) counts) that share one explode; the model —
(vocab x classes) log-probabilities — is joined back BY TERM (a standard
shuffle equi-join that scales with corpus vocabulary, never with the
class count), and the tiny per-class table (priors, OOV mass, token
totals) is a broadcast. No collect anywhere; the driver never sees the
vocabulary.

Cross-engine determinism: per-term log-probs are quantized to integer
MICRO-NATS before any summation (the lm_score convention), so per-doc
class scores are exact integer arithmetic — summation order cannot
drift, and the argmax is decided on exact integers with a lexicographic
class tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .search import _norm_tokens

MICRO = 1_000_000.0


def _micro(c):
    """Quantize a natural-log column to integer micro-nats."""
    return F.round(c * F.lit(MICRO), 0).cast("bigint")


def naive_bayes_classify(
    df: DataFrame,
    text_col: str = "text",
    label_col: str = "lang",
    id_col: str = "doc_id",
    round_dp: int = 4,
) -> DataFrame:
    """Train an add-one-smoothed multinomial NB on the labeled corpus and
    score every document (resubstitution — the standard quality-classifier
    fit/apply loop runs fit on a labeled slice and apply on the full
    corpus; with one frame they coincide).

    score(d, c) = prior(c) + sum_t count_d(t) * ln P(t | c), with unseen
    (t, c) falling back to the class OOV mass ln(1 / (T_c + V)). The sum
    is factored as ``prior + n_tok * oov_c + sum_seen count * (lp - oov)``
    so only (term, class) pairs that exist in the model are ever joined.

    Output: (id_col, label_col, pred, nb_score, correct) — ``nb_score``
    is the winning class's total log-likelihood (nats, rounded),
    ``correct`` compares pred to the training label.
    """
    base = df.select(F.col(id_col).alias("__id"),
                     F.col(label_col).alias("__y"),
                     _norm_tokens(F.col(text_col)).alias("__t"))
    toks = base.select("__id", "__y", F.explode("__t").alias("term"))

    # --- model: per-class token totals + doc priors (tiny), vocab size
    cls_tok = toks.groupBy("__y").agg(F.count("*").cast("double")
                                      .alias("t_c"))
    cls_doc = base.groupBy("__y").agg(F.count("*").cast("double")
                                      .alias("d_c"))
    vocab = toks.agg(F.count_distinct("term").cast("double").alias("v"))
    n_docs = base.agg(F.count("*").cast("double").alias("nd"))
    classes = (cls_tok.join(cls_doc, "__y")
               .crossJoin(F.broadcast(vocab))
               .crossJoin(F.broadcast(n_docs))
               .select("__y",
                       _micro(F.log(F.col("d_c") / F.col("nd")))
                       .alias("prior_u"),
                       _micro(F.log(F.lit(1.0) / (F.col("t_c") + F.col("v"))))
                       .alias("oov_u"),
                       (F.col("t_c") + F.col("v")).alias("denom")))

    # per-(class, term) smoothed log-prob, micro-quantized
    lp = (toks.groupBy("__y", "term")
          .agg(F.count("*").cast("double").alias("tf"))
          .join(F.broadcast(classes.select("__y", "denom", "oov_u")), "__y")
          .select(F.col("__y").alias("__c"), "term",
                  (_micro(F.log((F.col("tf") + 1.0) / F.col("denom")))
                   - F.col("oov_u")).alias("adj_u")))

    # --- scoring: per-doc term counts join the model BY TERM
    dtc = toks.groupBy("__id", "term").agg(F.count("*").cast("bigint")
                                           .alias("dn"))
    adj = (dtc.join(lp, "term")
           .groupBy("__id", "__c")
           .agg(F.sum(F.col("dn") * F.col("adj_u")).alias("adj_sum")))

    ndoc = base.select("__id", "__y",
                       F.size("__t").cast("bigint").alias("n_tok"))
    scored = (ndoc.crossJoin(F.broadcast(
                  classes.select(F.col("__y").alias("__c"),
                                 "prior_u", "oov_u")))
              .join(adj, ["__id", "__c"], "left")
              .select("__id", "__y", "__c",
                      (F.col("prior_u") + F.col("n_tok") * F.col("oov_u")
                       + F.coalesce(F.col("adj_sum"), F.lit(0)))
                      .alias("score_u")))
    # exact-integer argmax, class tie-break lexicographic
    w = Window.partitionBy("__id").orderBy(F.col("score_u").desc(),
                                           F.col("__c").asc())
    best = (scored.withColumn("__rk", F.row_number().over(w))
            .where(F.col("__rk") == 1))
    return best.select(
        F.col("__id").alias(id_col),
        F.col("__y").alias(label_col),
        F.col("__c").alias("pred"),
        # micro-nat totals / 1e6 land on the 4-dp half-boundary whenever
        # score_u ends in ...50 — the nudge is load-bearing here
        F.round(F.col("score_u") / F.lit(MICRO)
                + F.lit(10.0 ** -(round_dp + 5)), round_dp)
        .cast("double").alias("nb_score"),
        (F.col("__c") == F.col("__y")).alias("correct"))
