"""Deterministic mixture sampling: per-group up/down-sampling rates plus
a reproducible global training order (the "data mixing" step of a
pretraining pipeline — e.g. Wikipedia ×2.5, web ×0.5).

The reference's expression DSL delegates scalar work to Spark SQL
(`/root/reference/feathr-rs/src/model.rs:248-253`); mixture weighting is
an engine extension a training-data pipeline needs.

Semantics: a document in group g with rate r emits ``floor(r)`` whole
copies plus one more with probability ``frac(r)`` — in expectation every
group is scaled by exactly its rate, and each document's copy count is a
pure function of its id (deterministic across runs/engines, stable under
repartitioning; no RNG state). The fractional draw uses the engine-
portable 60-bit md5-prefix hash compared against an INTEGER threshold
``round(frac(r)·2^60)`` precomputed driver-side — no floating-point
comparison anywhere, so Spark and any SQL oracle agree bit-for-bit.

Design for scale: zero shuffles — the rate lookup is a CASE expression
over driver-supplied literals (a handful of groups, the realistic shape
of a mixture spec), the copy fan-out is a row-local
``explode(sequence())``, and the training order is a hash column the
consumer sorts/ranges by (sorting is the consumer's shuffle, not this
operator's). Salting the hash with ``seed`` re-deals both the fractional
draws and the order per epoch.
"""

from __future__ import annotations

import math
from typing import Dict

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import portable_hash64

_SCALE = 1 << 60  # portable_hash64 is uniform on [0, 2^60)


def _thresholds(rates: Dict[str, float], default_rate: float):
    """(whole copies, integer fractional threshold) per group, plus the
    default pair — all integer arithmetic from here on."""
    def pair(r):
        if r < 0:
            raise ValueError("rates must be non-negative")
        whole = int(math.floor(r))
        return whole, int(round((r - whole) * _SCALE))
    return {g: pair(r) for g, r in rates.items()}, pair(default_rate)


def mixture_sample(
    df: DataFrame,
    rates: Dict[str, float],
    group_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 1.0,
    seed: str = "",
) -> DataFrame:
    """Up/down-sample each group to its mixture rate, deterministically.

    Output: input columns + ``copy`` (0-based BIGINT copy index) and
    ``order_key`` (uniform BIGINT — sort by it for the shuffled training
    order; ties impossible beyond hash collisions, so consumers should
    sort by (order_key, id, copy)).
    """
    per_group, (dw, dt) = _thresholds(rates, default_rate)
    u = portable_hash64(F.concat(F.lit(f"mix{seed}|"),
                                 F.col(id_col).cast("string")))
    whole = F.lit(dw)
    thresh = F.lit(dt)
    for g, (w, t) in per_group.items():
        cond = F.col(group_col) == F.lit(g)
        whole = F.when(cond, F.lit(w)).otherwise(whole)
        thresh = F.when(cond, F.lit(t)).otherwise(thresh)
    n_copies = (whole + (u < thresh).cast("int")).cast("int")
    out = (df.withColumn("__n", n_copies)
           .where(F.col("__n") > 0)
           .withColumn("copy",
                       F.explode(F.sequence(F.lit(0).cast("bigint"),
                                            (F.col("__n") - 1).cast("bigint"))))
           .drop("__n"))
    order_key = portable_hash64(
        F.concat(F.lit(f"ord{seed}|"), F.col(id_col).cast("string"),
                 F.lit("#"), F.col("copy").cast("string")))
    return out.withColumn("order_key", order_key)


def temperature_rates(
    df: DataFrame,
    group_col: str = "lang",
    alpha: float = 0.5,
    round_dp: int = 6,
) -> Dict[str, float]:
    """Temperature-scaled mixture rates from observed group sizes — the
    multilingual-pretraining recipe (sample group g with probability
    proportional to ``n_g^alpha``; alpha < 1 up-weights the tail,
    alpha = 1 is the natural distribution):

        rate_g = (n_g^alpha / Σ_k n_k^alpha) · N / n_g

    so the EXPECTED corpus size stays N while the group mix follows the
    tempered distribution. Rates round to ``round_dp`` dp (with the
    repo's +1e-9 half-boundary nudge) so any SQL engine recomputing the
    same chain lands on identical thresholds.

    Group sizes collect to the driver — a groups-sized (languages /
    sources) bounded collect, the pq/clustering discipline. Feed the
    result straight to :func:`mixture_sample`.
    """
    if alpha < 0:
        raise ValueError("temperature_rates: alpha must be >= 0")
    sizes = {r[0]: r[1] for r in
             df.groupBy(group_col).count().collect()}
    if not sizes:
        return {}
    sp = sum(n ** alpha for n in sizes.values())
    nn = sum(sizes.values())
    return {g: round(n ** alpha / sp * nn / n + 1e-9, round_dp)
            for g, n in sizes.items()}


def weights_case_sql(col: str, weights: Dict[str, float]) -> str:
    """The CASE expression a SQL oracle mirrors for the per-group weight
    lookup of :func:`token_budget_plan` (literal ``repr`` of each double
    on both sides — both engines parse the decimal to the identical
    binary double). Groups not in ``weights`` get 0.0."""
    arms = " ".join(f"WHEN {col} = '{g}' THEN {w!r}"
                    for g, w in weights.items())
    return f"CASE {arms} ELSE 0.0 END"


def token_budget_plan(
    df: DataFrame,
    weights: Dict[str, float],
    budget_tokens: int,
    group_col: str = "source",
    text_col: str = "text",
    tokens_col: str = None,
    max_epochs: float = 4.0,
    round_dp: int = 4,
) -> DataFrame:
    """Turn a (mixture weights, token budget) spec into the per-source
    sampling plan a pretraining run executes — the planning table behind
    every published data-mixture ("X% web, Y% code, Z epochs of wiki"):

        target_g  = budget · w_g / Σw          (the mix the spec asks for)
        epochs_g  = target_g / tokens_g        (how many passes that needs)
        planned_g = min(epochs_g, max_epochs) · tokens_g
                                               (repetition capped — tokens
                                                recycled past the cap stop
                                                helping; the plan reports
                                                the shortfall instead of
                                                silently over-epoching)

    Groups absent from ``weights`` weigh 0 (excluded, reported with zero
    targets). Weights need not sum to 1 — they normalize.

    ONE corpus-sized aggregate (per-group doc/token counts, map-side
    combined into a groups-sized frame); everything after is scalar
    algebra on that frame — no second scan, no collect, no join. The
    weight lookup is a literal CASE shared verbatim with the SQL oracle
    (:func:`weights_case_sql`).

    Output per group: (group_col, n_docs, n_tokens, weight,
    target_tokens, epochs_uncapped, epochs, planned_tokens, capped).
    """
    if budget_tokens <= 0:
        raise ValueError("token_budget_plan: budget_tokens must be > 0")
    if max_epochs <= 0:
        raise ValueError("token_budget_plan: max_epochs must be > 0")
    wsum = float(sum(weights.values()))
    if not weights or wsum <= 0:
        raise ValueError("token_budget_plan: need positive weights")
    from .search import _norm_tokens
    n_tok = (F.col(tokens_col) if tokens_col
             else F.size(_norm_tokens(F.col(text_col)))).cast("bigint")
    agg = (df.groupBy(group_col)
           .agg(F.count(F.lit(1)).alias("__d"),
                F.sum(n_tok).alias("__t")))
    w = F.expr(weights_case_sql(group_col, weights)).cast("double")
    target = (w / F.lit(wsum)) * F.lit(float(budget_tokens))
    toks = F.col("__t").cast("double")
    ep_raw = target / toks
    ep = F.least(ep_raw, F.lit(float(max_epochs)))
    nudge = F.lit(1e-9)
    return agg.select(
        group_col,
        F.col("__d").cast("bigint").alias("n_docs"),
        F.col("__t").cast("bigint").alias("n_tokens"),
        F.round(w + nudge, round_dp).cast("double").alias("weight"),
        F.round(target + nudge, round_dp).cast("double")
        .alias("target_tokens"),
        F.round(ep_raw + nudge, round_dp).cast("double")
        .alias("epochs_uncapped"),
        F.round(ep + nudge, round_dp).cast("double").alias("epochs"),
        F.round(ep * toks + nudge, round_dp).cast("double")
        .alias("planned_tokens"),
        (ep_raw > F.lit(float(max_epochs))).alias("capped"))
