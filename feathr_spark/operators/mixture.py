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
