"""Null imputation for feature frames (mean / median / mode / constant,
optionally per group) — the standard pre-training repair pass a feature
pipeline runs between the PIT join and the model (the reference's
expression DSL leaves null handling to Spark SQL COALESCE,
`/root/reference/feathr-rs/src/model.rs:248-253`; a declarative
imputer with leakage-safe group statistics is the engine extension).

Design for scale:
  * ONE stats aggregate per strategy family over the data (mean/median
    share a single ``groupBy``; mode is a value-count aggregate whose
    shuffle carries (keys, value) pairs), each collapsing to a
    group-count-sized frame broadcast back onto the single data scan —
    the winsorize/robust_scale attach discipline;
  * the scan itself is never shuffled: fills are pure projections;
  * cross-engine determinism: means divide exact DECIMAL sums once;
    medians are exact interpolated percentiles QUANTIZED to
    ``round_cuts_dp`` decimals before use (the robust_scale r9 lesson —
    interpolated quantiles are the one recorded cross-engine divergence
    class, and quantizing the cut kills the 1-ulp drift); modes break
    ties to the LOWEST value under the exact (count DESC, value ASC)
    total order.

Every imputed column gains a ``{col}__was_null`` flag so downstream
training can keep the missingness signal (the standard
indicator-variable practice).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def impute_nulls(
    df: DataFrame,
    strategies: Dict[str, str],
    by: Sequence[str] = (),
    constants: Optional[Dict[str, object]] = None,
    round_cuts_dp: int = 4,
) -> DataFrame:
    """Fill nulls per ``strategies`` = {column: 'mean' | 'median' |
    'mode' | 'constant'} (constants supply the 'constant' values),
    optionally within ``by`` groups; groups with no observed value for
    a column keep their nulls (no global fallback is invented — gate or
    re-impute globally downstream). Adds ``{col}__was_null`` booleans.

    Type note: mean/median fills are doubles, so COALESCE widens an
    integer column to double — cast back afterwards if the model wants
    the original type (a silent truncating cast here would corrupt the
    fill). Mode/constant fills keep the column's own type.
    """
    constants = constants or {}
    keys = list(by)
    bad = [c for c, s in strategies.items()
           if s not in ("mean", "median", "mode", "constant")]
    if bad:
        raise ValueError(f"impute_nulls: unknown strategy for {bad}")
    missing = [c for c, s in strategies.items()
               if s == "constant" and c not in constants]
    if missing:
        raise ValueError(f"impute_nulls: constant strategy for {missing} "
                         "but no constants[...] entry")
    from ._join import broadcast_attach

    out = df
    for c in strategies:
        out = out.withColumn(f"{c}__was_null", F.col(c).isNull())

    # mean/median share ONE group aggregate
    agg_exprs = []
    for c, s in strategies.items():
        if s == "mean":
            # exact decimal total, one IEEE division (bit-stable under
            # any partitioning; the standardize/profile convention)
            agg_exprs.append(
                (F.sum(F.col(c).cast("decimal(28,6)")).cast("double")
                 / F.count(c)).alias(f"__fill_{c}"))
        elif s == "median":
            agg_exprs.append(
                F.round(F.expr(f"percentile({c}, 0.5)"),
                        round_cuts_dp).alias(f"__fill_{c}"))
    if agg_exprs:
        stats = df.groupBy(*keys).agg(*agg_exprs)
        out = broadcast_attach(out, stats, keys, "left")

    # modes: one (keys, value) count aggregate per mode column, cut to
    # one row per group by the exact (count DESC, value ASC) order
    from pyspark.sql import Window
    for c, s in strategies.items():
        if s != "mode":
            continue
        vc = (df.where(F.col(c).isNotNull())
              .groupBy(*keys, F.col(c).alias("__val"))
              .agg(F.count("*").alias("__n")))
        if keys:
            w = Window.partitionBy(*keys).orderBy(
                F.col("__n").desc(), F.col("__val").asc())
            mode = (vc.withColumn("__rn", F.row_number().over(w))
                    .where(F.col("__rn") == 1)
                    .select(*keys, F.col("__val").alias(f"__fill_{c}")))
        else:
            # global mode: TakeOrderedAndProject, never an unpartitioned
            # window (single-task sort over the value-count frame)
            mode = (vc.orderBy(F.col("__n").desc(), F.col("__val").asc())
                    .limit(1)
                    .select(F.col("__val").alias(f"__fill_{c}")))
        out = broadcast_attach(out, mode, keys, "left")

    for c, s in strategies.items():
        if s == "constant":
            fill = F.lit(constants[c])
        else:
            fill = F.col(f"__fill_{c}")
        out = out.withColumn(c, F.coalesce(F.col(c), fill))
    return out.drop(*[f"__fill_{c}" for c, s in strategies.items()
                      if s != "constant"])
