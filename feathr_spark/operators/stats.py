"""Experiment statistics: Welch's two-sample t over metric frames.

The A/B readout every event-analytics platform ships. One aggregate pass
computes each variant's exact decimal moments (the same bit-stable
discipline as profile_numeric/standardize); the t statistic and
Welch–Satterthwaite degrees of freedom are scalar arithmetic on the tiny
per-variant frame. No p-value column on purpose: neither engine exposes
the t CDF portably — consumers threshold |t| (|t| > 1.96 ≈ 5% for the
df's this targets) or feed t/df to scipy driver-side.
"""
from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ab_welch_t(
    df: DataFrame,
    group_col: str,
    metric_col: str,
    control: str,
    treatment: str,
) -> DataFrame:
    """Welch's unequal-variance t-test between two variants.

    Output (one row): n/mean/std per variant (sample std, ddof=1),
    ``mean_diff`` (treatment − control), ``t_stat`` and ``welch_df``.
    Groups need n ≥ 2 and non-zero variance in at least one arm, else
    the t columns are NULL. The metric frame is scanned ONCE (two
    filtered aggregate sets side by side — no per-variant jobs).
    """
    d = F.col(metric_col).cast("decimal(28,8)")

    def side(tag, value):
        cond = F.col(group_col) == F.lit(value)
        return [
            F.count(F.when(cond, F.col(metric_col))).alias(f"__n_{tag}"),
            F.sum(F.when(cond, d)).alias(f"__s_{tag}"),
            F.sum(F.when(cond, d * d)).alias(f"__ss_{tag}"),
        ]

    stats = df.agg(*(side("c", control) + side("t", treatment)))

    def derived(tag):
        n = F.col(f"__n_{tag}").cast("double")
        s = F.col(f"__s_{tag}").cast("double")
        ss = F.col(f"__ss_{tag}").cast("double")
        mean = s / n
        var = F.when(n > 1, (ss - s * s / n) / (n - 1))
        return n, mean, var

    nc, mc, vc = derived("c")
    nt, mt, vt = derived("t")
    se2 = vc / nc + vt / nt
    t = F.when(se2 > 0, (mt - mc) / F.sqrt(se2))
    dfree = F.when(
        se2 > 0,
        (se2 * se2) / ((vc / nc) * (vc / nc) / (nc - 1)
                       + (vt / nt) * (vt / nt) / (nt - 1)))
    return stats.select(
        F.lit(control).alias("control"),
        F.lit(treatment).alias("treatment"),
        F.col("__n_c").cast("bigint").alias("n_control"),
        F.col("__n_t").cast("bigint").alias("n_treatment"),
        mc.alias("mean_control"),
        mt.alias("mean_treatment"),
        F.sqrt(vc).alias("std_control"),
        F.sqrt(vt).alias("std_treatment"),
        (mt - mc).alias("mean_diff"),
        t.alias("t_stat"),
        dfree.alias("welch_df"))
