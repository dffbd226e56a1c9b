"""Unigram language-model scoring: corpus LM build + per-document
log-probability (a KenLM-style perplexity proxy for corpus quality
filtering, as used by CCNet/Gopher-class training-data pipelines).

The reference's expression DSL delegates scalar work to Spark SQL
(`/root/reference/feathr-rs/src/model.rs:248-253`); LM-based quality
scoring is an engine extension a training-data pipeline needs (filter
documents whose token distribution diverges from a reference corpus).

Design for scale:
  * the LM is a (term, tf, logprob) frame built with one map-side-combined
    ``groupBy(term)`` shuffle — never a driver-side vocabulary;
  * smoothing constants (total token count, vocabulary size) travel as a
    single-row broadcast aggregate, not a collect;
  * per-document scoring collapses token repetition FIRST
    (``groupBy(doc, term)``) so the LM join carries at most one row per
    distinct (doc, term) — hot stop-words join once per document, not once
    per occurrence, and AQE's skew-join split handles the residual
    head-of-zipf skew (the LM side is join-key-unique so splitting is
    always safe);
  * the LM join is left to Catalyst/AQE: a small-corpus LM broadcasts, a
    100 TB-corpus vocabulary (still only ~10^7-10^8 rows — vocabulary
    grows sub-linearly in corpus size) falls back to a shuffle join;
  * per-document mean log-prob aggregates ORDER-INDEPENDENTLY: each
    term's logprob is quantized to integer micro-nats first and summed as
    BIGINT (exact, associative), so the result is bit-stable across
    partitionings — a double sum would be partition-order-dependent.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .search import _norm_tokens

# quantization scale for order-independent integer aggregation of
# per-term log-probs (micro-nats)
_MICRO = 1_000_000.0


def _nudged_round(c, round_dp: int):
    """Repo-wide cross-engine rounding: ``round(x + 10^-(dp+5), dp)``.

    The nudge breaks exact .5-at-the-last-digit ties, where Spark
    (HALF_UP on the double's shortest decimal repr) and other engines
    (rounding the binary value) disagree; any oracle must add the same
    constant. It is scaled to the precision — 5 orders of magnitude
    below the rounding grid (1e-9 at the conventional dp=4) — so it can
    shift only values within 10^-(dp+5) of a grid half-boundary and
    never biases results at any dp (a fixed 1e-9 would EQUAL the grid
    step at dp=9 and round everything up).
    """
    return F.round(c + F.lit(10.0 ** -(round_dp + 5)), round_dp)


def _lm_and_oov(df: DataFrame, text_col: str):
    """(lm, oov) pair sharing ONE corpus-scale term shuffle: the OOV
    constant derives from the same single-row stats aggregate the
    per-term log-probs broadcast, so Spark plans the counts exchange once
    and reuses it (ReusedExchange) for the OOV branch."""
    toks = df.select(F.explode(_norm_tokens(F.col(text_col))).alias("term"))
    counts = toks.groupBy("term").agg(F.count("*").cast("bigint").alias("tf"))
    stats = counts.agg(F.sum("tf").cast("double").alias("__total"),
                       F.count("*").cast("double").alias("__vocab"))
    lm = (counts.crossJoin(F.broadcast(stats))
          .select("term", "tf",
                  F.log((F.col("tf") + F.lit(1.0))
                        / (F.col("__total") + F.col("__vocab")))
                  .alias("logprob")))
    oov = stats.select(
        F.log(F.lit(1.0) / (F.col("__total") + F.col("__vocab")))
        .alias("__oov"))
    return lm, oov


def unigram_lm(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add-one-smoothed unigram LM over a corpus.

    logprob(t) = ln((tf(t) + 1) / (total_tokens + |vocab|))

    Output: (term, tf, logprob). One explode + one ``groupBy(term)``
    shuffle (map-side combined); the smoothing denominator arrives as a
    single-row broadcast aggregate.
    """
    return _lm_and_oov(df, text_col)[0]


def _oov_logprob(lm: DataFrame) -> DataFrame:
    """Single-row frame with the smoothed out-of-vocabulary log-prob
    ln(1 / (total + |vocab|)), recovered from an externally-supplied LM so
    scoring a foreign corpus needs no side-channel state."""
    return lm.agg(
        F.log(F.lit(1.0) / (F.sum("tf").cast("double") + F.count("*")))
        .alias("__oov"))


def score_documents(
    df: DataFrame,
    lm: Optional[DataFrame] = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_dp: int = 4,
) -> DataFrame:
    """Per-document mean token log-prob under a unigram LM, plus the
    perplexity proxy ``ppl = exp(-mean_logprob)``.

    ``lm=None`` scores the corpus under its own LM (the common quality-
    filter setup); pass the LM of a reference corpus to score a candidate
    corpus against it (out-of-vocabulary terms get the smoothed OOV mass).

    Determinism contract: per-term log-probs are quantized to integer
    micro-nats and summed as BIGINT, so the per-document sum is exact and
    independent of partition/aggregation order; the mean is rounded to
    ``round_dp`` and ``ppl`` is derived from the ROUNDED mean
    (round-before-derive, same convention as round-before-rank).

    Output: (``id_col``, n_tokens, mean_logprob, ppl).
    """
    if lm is None:
        lm, oov = _lm_and_oov(df, text_col)
    else:
        oov = _oov_logprob(lm)
    doc_terms = (df.select(F.col(id_col).alias("__id"),
                           F.explode(_norm_tokens(F.col(text_col)))
                           .alias("term"))
                 .groupBy("__id", "term")
                 .agg(F.count("*").cast("bigint").alias("__c")))
    joined = (doc_terms
              .join(lm.select("term", "logprob"), "term", "left")
              .crossJoin(F.broadcast(oov)))
    lp_micro = F.round(F.coalesce(F.col("logprob"), F.col("__oov"))
                       * F.lit(_MICRO), 0).cast("bigint")
    per_doc = (joined
               .groupBy("__id")
               .agg(F.sum("__c").cast("bigint").alias("n_tokens"),
                    F.sum(F.col("__c") * lp_micro).alias("__sum_micro")))
    # nudged like score_documents_bigram (ADVICE r8): the micro-nat mean
    # has the identical .00005-boundary hazard on the unigram path;
    # mirrored in the lm_score / ccnet_buckets oracle SQL.
    mean = _nudged_round(
        F.col("__sum_micro") / F.lit(_MICRO) / F.col("n_tokens"), round_dp)
    return per_doc.select(
        F.col("__id").alias(id_col),
        F.col("n_tokens"),
        mean.cast("double").alias("mean_logprob"),
        _nudged_round(F.exp(-mean), round_dp).cast("double").alias("ppl"))


def bigram_lm(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Bigram LM table: (w1, w2, c_bigram, c_prefix, logprob) with
    logprob = ln(c(w1 w2) / c(w1·)) — the maximum-likelihood conditional
    used by stupid backoff (Brants et al. 2007, the web-scale
    distributed-LM design this module follows: no normalization pass, no
    discount bookkeeping, counts compose under union).

    One explode produces the transition pairs JVM-side (zip of the token
    array with its tail); one ``groupBy(w1, w2)`` shuffle builds the
    table; prefix totals re-aggregate the (much smaller) bigram counts,
    never the corpus.
    """
    toks = df.select(_norm_tokens(F.col(text_col)).alias("__t"))
    n1 = F.greatest(F.size("__t") - 1, F.lit(0))
    pairs = toks.select(F.explode(F.arrays_zip(
        F.slice(F.col("__t"), 1, n1).alias("w1"),
        F.slice(F.col("__t"), 2, n1).alias("w2"),
    )).alias("__p")).select("__p.w1", "__p.w2")
    counts = pairs.groupBy("w1", "w2").agg(
        F.count("*").cast("bigint").alias("c_bigram"))
    prefix = counts.groupBy("w1").agg(
        F.sum("c_bigram").cast("bigint").alias("c_prefix"))
    return (counts.join(prefix, "w1")
            .select("w1", "w2", "c_bigram", "c_prefix",
                    F.log(F.col("c_bigram") / F.col("c_prefix"))
                    .alias("logprob")))


def score_documents_bigram(
    df: DataFrame,
    lm_corpus: Optional[DataFrame] = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.4,
    round_dp: int = 4,
) -> DataFrame:
    """Per-document mean TRANSITION log-score under the corpus's own
    bigram LM with stupid backoff: a seen bigram scores
    ln(c(w1 w2)/c(w1·)); an unseen one backs off to
    ln(alpha) + unigram logprob(w2) (add-one smoothed; unseen w2 gets
    the OOV mass). ``lm_corpus`` supplies the reference corpus the LM is
    built from (default: score the corpus under its own LM, where every
    transition is seen and backoff never fires — backoff matters when
    scoring a candidate corpus against a reference). Documents with < 2
    tokens have no transitions and produce no row.

    Plan shape mirrors :func:`score_documents`: per-doc repeated
    transitions collapse BEFORE the LM joins (hot bigrams join once per
    doc); the bigram and unigram tables join by their own keys
    (AQE-decided strategy); the per-doc fold sums exact integer
    micro-nats (order-independent, bit-stable).

    Output: (id, n_transitions, mean_logprob, ppl).
    """
    ref = lm_corpus if lm_corpus is not None else df
    uni, oov = _lm_and_oov(ref, text_col)
    blm = bigram_lm(ref, text_col)
    toks = df.select(F.col(id_col).alias("__id"),
                     _norm_tokens(F.col(text_col)).alias("__t"))
    n1 = F.greatest(F.size("__t") - 1, F.lit(0))
    trans = (toks.select("__id", F.explode(F.arrays_zip(
        F.slice(F.col("__t"), 1, n1).alias("w1"),
        F.slice(F.col("__t"), 2, n1).alias("w2"),
    )).alias("__p"))
        .select("__id", "__p.w1", "__p.w2")
        .groupBy("__id", "w1", "w2")
        .agg(F.count("*").cast("bigint").alias("__c")))
    joined = (trans
              .join(blm.select("w1", "w2",
                               F.col("logprob").alias("__blp")),
                    ["w1", "w2"], "left")
              .join(uni.select(F.col("term").alias("w2"),
                               F.col("logprob").alias("__ulp")),
                    "w2", "left")
              .crossJoin(F.broadcast(oov)))
    import math
    backoff = F.lit(math.log(alpha)) + F.coalesce(F.col("__ulp"),
                                                  F.col("__oov"))
    lp_micro = F.round(F.coalesce(F.col("__blp"), backoff) * F.lit(_MICRO),
                       0).cast("bigint")
    per_doc = (joined.groupBy("__id")
               .agg(F.sum("__c").cast("bigint").alias("n_transitions"),
                    F.sum(F.col("__c") * lp_micro).alias("__sum_micro")))
    # nudged rounding (see _nudged_round; mirrored in the oracle SQL):
    # the micro-nat mean can land exactly on a .00005 boundary
    # (observed: sum -115815900 / 34 transitions = -3.40635 at sf0.1),
    # where Spark's round (HALF_UP on the double's SHORTEST decimal
    # repr) and DuckDB's (on the binary value) disagree.
    mean = _nudged_round(
        F.col("__sum_micro") / F.lit(_MICRO) / F.col("n_transitions"),
        round_dp)
    return per_doc.select(
        F.col("__id").alias(id_col),
        F.col("n_transitions"),
        mean.cast("double").alias("mean_logprob"),
        _nudged_round(F.exp(-mean), round_dp)
        .cast("double").alias("ppl"))


def ccnet_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lm: Optional[DataFrame] = None,
    lang_col: Optional[str] = None,
    round_dp: int = 4,
) -> DataFrame:
    """CCNet-style per-language perplexity bucketing: score every
    document's unigram-LM perplexity and split each language's
    distribution into equal-frequency terciles — ``head`` (lowest
    perplexity, most fluent), ``middle``, ``tail``. The standard
    LLM-training-data quality partition (Wenzek et al., "CCNet:
    Extracting High Quality Monolingual Datasets from Web Crawl Data",
    LREC 2020): pretraining mixes sample head/middle heavily and
    down-weight or drop tail.

    ``lm`` is the reference LM to score against (CCNet uses a Wikipedia
    LM per language); ``None`` self-scores the corpus under its own LM.
    ``lang_col`` names an existing language column; ``None`` detects
    with the row-local n-gram heuristic (:func:`..text.lang_id`).
    Cut points are exact per-language interior percentiles over the
    ROUNDED ppl, themselves rounded to ``round_dp`` (interpolation
    between equal neighbors is engine-divergent at the 1e-15 level —
    see ``quantile_bins.round_cuts_dp``); bucket = cuts strictly below,
    so ties on a cut fall toward ``head`` and the mapping is
    engine-portable. Documents with no
    tokens have no perplexity and are omitted.

    Plan: one corpus term shuffle (the LM + per-doc scores), a row-local
    language column, one doc-sized per-language percentile aggregate
    whose language-cardinality-sized cuts frame broadcasts back — the
    corpus text is scanned once, the doc-id frame never shuffles wide.

    Output: (``id_col``, lang, ppl, tercile 0|1|2, bucket
    head|middle|tail).
    """
    from .scaling import quantile_bins
    if lang_col is None:
        from .text import lang_id as _lang_heuristic
        lang = _lang_heuristic(F.col(text_col))
    else:
        lang = F.col(lang_col)
    scored = score_documents(df, lm=lm, text_col=text_col, id_col=id_col,
                             round_dp=round_dp)
    base = df.select(F.col(id_col), lang.alias("lang"))
    # persist: quantile_bins consumes its input TWICE (the cuts
    # aggregate + the probe side) and this input embeds the whole LM
    # term shuffle — unpersisted, the corpus scores twice
    j = base.join(scored.select(id_col, "ppl"), id_col).persist()
    binned = quantile_bins(j, "ppl", bins=3, by=["lang"],
                           round_cuts_dp=round_dp)
    names = F.array(F.lit("head"), F.lit("middle"), F.lit("tail"))
    from ._cache import attach_intermediates
    return attach_intermediates(binned.select(
        F.col(id_col), "lang", "ppl",
        F.col("ppl_bin").alias("tercile"),
        F.element_at(names, F.col("ppl_bin").cast("int") + 1)
        .alias("bucket")), [j])


def dsir_logratio(
    df: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_dp: int = 4,
) -> DataFrame:
    """DSIR-style importance scores for training-data selection (Xie et
    al., "Data Selection for Language Models via Importance
    Resampling", NeurIPS 2023): score every raw document under BOTH a
    target-domain LM and the raw corpus's own LM and emit the per-token
    mean log likelihood ratio — positive means the document looks more
    like the target domain than like the raw corpus background.
    Selection then composes with the existing samplers: importance
    resampling draws with probability ∝ exp(logratio) (feed
    ``weighted_sample``), hard selection takes top-k by ``logratio``.

    DSIR hashes n-gram features; this engine's portable equivalent is
    the unigram LM family already proven against the driver oracle
    (add-one smoothing, OOV mass for terms unseen in the target,
    integer micro-nat folds — order-independent and bit-stable). The
    per-TOKEN mean keeps the score length-independent; multiply by
    ``n_tokens`` for the full-document ratio.

    Plan: two corpus term shuffles (one per LM — the raw corpus text is
    scanned once per scoring pass over the SAME doc_terms shape) plus
    the target corpus's LM build; every attach frame is vocabulary- or
    single-row-sized. Output: (``id_col``, n_tokens, logprob_raw,
    logprob_target, logratio), all log-probs per-token means rounded to
    ``round_dp``. An EMPTY target corpus has no LM: ``logprob_target``
    and ``logratio`` come back NULL for every row (the SQL no-evidence
    answer — validating emptiness up front would cost a driver-side
    pass; filter on ``logratio IS NOT NULL`` or pre-check the target).
    """
    raw = score_documents(df, text_col=text_col, id_col=id_col,
                          round_dp=round_dp) \
        .select(F.col(id_col), "n_tokens",
                F.col("mean_logprob").alias("logprob_raw"))
    tgt_lm = unigram_lm(target, text_col=text_col)
    tgt = score_documents(df, lm=tgt_lm, text_col=text_col,
                          id_col=id_col, round_dp=round_dp) \
        .select(F.col(id_col),
                F.col("mean_logprob").alias("logprob_target"))
    out = raw.join(tgt, id_col)
    ratio = _nudged_round(
        F.col("logprob_target") - F.col("logprob_raw"), round_dp)
    return out.select(F.col(id_col), "n_tokens", "logprob_raw",
                      "logprob_target",
                      ratio.cast("double").alias("logratio"))


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    k: int = 20,
    round_dp: int = 4,
) -> DataFrame:
    """Top-``k`` collocations (statistically bound word bigrams) by
    pointwise mutual information, with the t-score as a second
    association readout — the phrase-mining pass that seeds tokenizer
    vocabularies and multi-word expressions (Church & Hanks 1990's PMI;
    Manning & Schütze ch. 5's t-test formulation).

        pmi(w1, w2) = ln( p(w1 w2) / (p(w1) p(w2)) )
                    = ln( c12 · N · N / (B · c1 · c2) )
        t(w1, w2)   = (c12 − B·p(w1)·p(w2)) / sqrt(c12)

    with ``c12`` the bigram count over ``B`` total transitions and
    ``c1``/``c2`` unigram counts over ``N`` total tokens (the
    :func:`bigram_lm` tokenization: whitespace tokens of lowercased
    whitespace-normalized text, pairs zipped across the whole document).
    ``min_count`` drops the unstable low-frequency tail BEFORE the
    unigram joins (PMI is notoriously maximized by hapax pairs; the
    frequency floor is the standard guard).

    Plan shape: one corpus-sized transition aggregate + one corpus-sized
    unigram aggregate (both map-side combined, bigram-/vocabulary-type-
    sized after), two vocabulary-keyed joins on the *filtered* bigram
    table (AQE picks broadcast when the survivor set is small), totals
    as single-row broadcast aggregates, and the final top-k compiles to
    TakeOrderedAndProject — no global sort, no driver vocabulary.

    Ranking is round-before-rank on the nudged 4-dp PMI with (w1, w2)
    tie-breaks, so the cut is reproducible cross-engine (a raw-double
    rank key would let a 1-ulp ``ln`` difference swap the boundary
    rows). Output: (w1, w2, c_pair, pmi, t_score), pmi-descending.
    """
    toks = df.select(_norm_tokens(F.col(text_col)).alias("__t"))
    n1 = F.greatest(F.size("__t") - 1, F.lit(0))
    pairs = (toks.select(F.explode(F.arrays_zip(
        F.slice(F.col("__t"), 1, n1).alias("w1"),
        F.slice(F.col("__t"), 2, n1).alias("w2"))).alias("__p"))
        .select("__p.w1", "__p.w2")
        .where((F.col("w1") != "") & (F.col("w2") != "")))
    c12 = (pairs.groupBy("w1", "w2")
           .agg(F.count("*").cast("bigint").alias("c_pair")))
    uni = (df.select(F.explode(_norm_tokens(F.col(text_col)))
                     .alias("term"))
           .where(F.col("term") != "")
           .groupBy("term")
           .agg(F.count("*").cast("bigint").alias("c_term")))
    # single-row totals, broadcast onto the survivor frame (transition
    # total B re-aggregates the bigram table, never the corpus)
    tot_b = c12.agg(F.sum("c_pair").cast("bigint").alias("__B"))
    tot_n = uni.agg(F.sum("c_term").cast("bigint").alias("__N"))
    surv = (c12.where(F.col("c_pair") >= int(min_count))
            .join(uni.select(F.col("term").alias("w1"),
                             F.col("c_term").alias("__c1")), "w1")
            .join(uni.select(F.col("term").alias("w2"),
                             F.col("c_term").alias("__c2")), "w2")
            .crossJoin(F.broadcast(tot_b))
            .crossJoin(F.broadcast(tot_n)))
    # expression order mirrored verbatim in the oracle SQL: identical
    # parse trees give identical doubles (left-assoc products), and the
    # nudged 4-dp round absorbs the residual 1-ulp libm-ln class
    c12d = F.col("c_pair").cast("double")
    c1d, c2d = F.col("__c1").cast("double"), F.col("__c2").cast("double")
    bd, nd = F.col("__B").cast("double"), F.col("__N").cast("double")
    pmi = F.log(c12d * nd * nd / (bd * c1d * c2d))
    t = (c12d - bd * (c1d / nd) * (c2d / nd)) / F.sqrt(c12d)
    pmi_r = _nudged_round(pmi, round_dp).cast("double")
    return (surv.select("w1", "w2", F.col("c_pair"),
                        pmi_r.alias("pmi"),
                        _nudged_round(t, round_dp).cast("double")
                        .alias("t_score"))
            .orderBy(F.col("pmi").desc(), F.col("w1").asc(),
                     F.col("w2").asc())
            .limit(int(k)))


def vocab_coverage(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 500,
    round_dp: int = 4,
) -> DataFrame:
    """Per-document coverage of the corpus top-``vocab_size`` vocabulary:
    the tokenizer-budget readout of a training-data pipeline (what OOV
    rate does a V-term vocabulary leave on each document / source?).

    Vocabulary = the ``vocab_size`` most frequent whitespace tokens,
    ties broken lexicographically so the cutoff is deterministic at any
    partitioning and on any engine. Coverage = in-vocab tokens / tokens
    — an exact integer ratio; the only float op is the final divide of
    the identical pair of integers on every engine.

    Physical shape: one term-keyed aggregate (map-side combined) feeds a
    TakeOrdered top-V (never a full vocabulary sort), the V-row vocab is
    BROADCAST back onto the per-(doc, term) counts, and one doc-keyed
    aggregate emits the result. The corpus is scanned once.

    Output: (id_col, n_tok, n_oov, coverage).
    """
    base = df.select(F.col(id_col).alias("__id"),
                     _norm_tokens(F.col(text_col)).alias("__t"))
    toks = base.select("__id", F.explode("__t").alias("term"))
    freq = toks.groupBy("term").agg(F.count("*").alias("tf"))
    # orderBy+limit compiles to TakeOrderedAndProject: per-partition
    # top-V heaps, never a global vocabulary sort
    vocab = (freq.orderBy(F.col("tf").desc(), F.col("term").asc())
             .limit(int(vocab_size))
             .select("term"))
    dtc = toks.groupBy("__id", "term").agg(F.count("*").alias("dn"))
    inv = (dtc.join(F.broadcast(vocab), "term")
           .groupBy("__id")
           .agg(F.sum("dn").cast("bigint").alias("__inv")))
    ndoc = base.select("__id", F.size("__t").cast("bigint").alias("n_tok"))
    out = ndoc.join(inv, "__id", "left").select(
        "__id", "n_tok",
        (F.col("n_tok") - F.coalesce(F.col("__inv"), F.lit(0)))
        .cast("bigint").alias("n_oov"))
    return out.select(
        F.col("__id").alias(id_col), "n_tok", "n_oov",
        F.when(F.col("n_tok") > 0,
               (F.col("n_tok") - F.col("n_oov")).cast("double")
               / F.col("n_tok"))
        .cast("double").alias("coverage"))


def zipf_fit(
    df: DataFrame,
    text_col: str = "text",
    top_n: int = 100,
    round_dp: int = 4,
) -> DataFrame:
    """Zipf's-law fit over the corpus rank-frequency curve: OLS of
    ln(frequency) on ln(rank) for the ``top_n`` most frequent tokens.
    The classic corpus-health readout (natural text sits near slope −1;
    boilerplate-heavy or template-generated corpora flatten or steepen
    the head) — a cheap pre-training sanity gate next to
    :func:`vocab_coverage`.

    Cross-engine determinism: ranks come from the exact (tf DESC, term
    ASC) order; ln(rank) and ln(tf) are quantized to integer micro-nats
    and ALL OLS moments (Σx, Σy, Σxy, Σx², Σy²) are exact integer sums
    — slope/intercept/r² are single identical divisions at the edge.
    Physical shape: one term aggregate feeds a TakeOrdered top-N; the
    rank window and the moment fold run on the N-row frame.

    Output (1 row): (n_terms, slope, intercept, r2); intercept in nats.
    """
    from pyspark.sql import Window
    toks = df.select(F.explode(_norm_tokens(F.col(text_col))).alias("term"))
    freq = toks.groupBy("term").agg(F.count("*").alias("tf"))
    top = (freq.orderBy(F.col("tf").desc(), F.col("term").asc())
           .limit(int(top_n)))
    w = Window.orderBy(F.col("tf").desc(), F.col("term").asc())
    pts = top.select(
        F.round(F.log(F.row_number().over(w).cast("double")) * F.lit(1e6),
                0).cast("bigint").alias("__x"),
        F.round(F.log(F.col("tf").cast("double")) * F.lit(1e6), 0)
        .cast("bigint").alias("__y"))
    m = pts.agg(F.count("*").cast("bigint").alias("n"),
                F.sum("__x").alias("sx"), F.sum("__y").alias("sy"),
                F.sum(F.col("__x") * F.col("__y")).alias("sxy"),
                F.sum(F.col("__x") * F.col("__x")).alias("sxx"),
                F.sum(F.col("__y") * F.col("__y")).alias("syy"))
    n = F.col("n").cast("double")
    # moment combinations in DECIMAL(38,0), not BIGINT (ADVICE r9):
    # sy*sy is the binding term — it passes 2^63 once the geometric-
    # mean head frequency exceeds e^30.4 ≈ 1.6e13, realistic for a
    # 100 TB corpus. Decimal38 holds to ~e^190 and the exact integer
    # difference casts to double identically to the oracle's HUGEINT.
    def _d38(c):
        return c.cast("decimal(38,0)")

    cov = (_d38(F.col("n")) * _d38(F.col("sxy"))
           - _d38(F.col("sx")) * _d38(F.col("sy"))).cast("double")
    vx = (_d38(F.col("n")) * _d38(F.col("sxx"))
          - _d38(F.col("sx")) * _d38(F.col("sx"))).cast("double")
    vy = (_d38(F.col("n")) * _d38(F.col("syy"))
          - _d38(F.col("sy")) * _d38(F.col("sy"))).cast("double")
    # ANSI-safe degenerate guards: vx = 0 cannot happen for n > 1
    # (ranks are distinct), but a flat-frequency head makes vy = 0 —
    # slope is then an exact 0 and r² is undefined (NULL)
    slope = F.when(vx > 0, cov / vx).otherwise(F.lit(0.0))
    nudge = F.lit(10.0 ** -(round_dp + 5))
    return m.select(
        F.col("n").alias("n_terms"),
        F.round(slope + nudge, round_dp).cast("double").alias("slope"),
        F.round((F.col("sy").cast("double") - slope
                 * F.col("sx").cast("double")) / n / F.lit(1e6) + nudge,
                round_dp).cast("double").alias("intercept"),
        F.when((vx > 0) & (vy > 0),
               F.round(cov * cov / (vx * vy) + nudge, round_dp))
        .cast("double").alias("r2"))
