"""Feature screening: histogram-split decision stumps.

The feature-selection primitive of gradient-boosting data prep
(LightGBM/XGBoost's histogram split finder, reduced to one level): for
each candidate numeric feature, bucket it into B equal-width bins and
find the bin boundary whose binary split most reduces Gini impurity of
a binary label. Features that cannot beat the root impurity are noise
candidates; the ranking orders features by stand-alone signal before
any expensive model run.

Reference parity note: the reference engine has no model-side compute;
this extends the LLM/feature-pipeline surface (same family as
encoding.py's target/WOE encoders, which assume the screen already
happened).

Scale shape: per feature, one bounds aggregate (1 row, broadcast) and
one bucket-count aggregate (<= B rows out of a map-side combine) — the
corpus is scanned twice per feature with column pruning, and every
downstream step (cumulative split table, argmin) runs on the B-row
frame. Nothing scales with row count except the scans; features fold
into one output via union of B-row frames.

Cross-engine determinism: bucket indices use the repo's fixed
(v−lo)/((hi−lo)/B) expression tree; counts are exact integers; the
weighted post-split impurity is ranked NANO-QUANTIZED (integer), so the
argmin and the tie-break (lower boundary first) are exact on any
engine.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stump_screen(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    bins: int = 64,
    round_dp: int = 4,
) -> DataFrame:
    """Best histogram split per feature vs a boolean/0-1 label.

    Output, one row per feature: (feature, threshold, n_left, n_right,
    gini_root, gini_split, gini_gain) — ``threshold`` is the bucket
    boundary value (left branch is v < threshold), ``gini_split`` the
    n-weighted post-split impurity, ``gain`` their difference. NULL
    rows (feature or label) are excluded per feature; a constant
    feature admits no split and yields no output row.
    """
    if not feature_cols:
        raise ValueError("stump_screen: need at least one feature")
    b = int(bins)
    if b < 2:
        raise ValueError("stump_screen: bins must be >= 2")
    y = F.col(label_col).cast("int").cast("bigint")
    outs = []
    for feat in feature_cols:
        v = F.col(feat).cast("double")
        base = (df.where(v.isNotNull() & y.isNotNull())
                .select(v.alias("__v"), y.alias("__y")))
        bounds = base.agg(F.min("__v").alias("__lo"),
                          F.max("__v").alias("__hi"))
        width = (F.col("__hi") - F.col("__lo")) / F.lit(float(b))
        idx = (F.when(F.col("__hi") == F.col("__lo"), F.lit(0))
               .otherwise(F.least(
                   F.floor((F.col("__v") - F.col("__lo")) / width),
                   F.lit(b - 1)))).cast("bigint")
        cells = (base.crossJoin(F.broadcast(bounds))
                 .select(idx.alias("__b"), "__y", "__lo", "__hi")
                 .groupBy("__b")
                 .agg(F.count("*").alias("__n"),
                      F.sum("__y").alias("__p"),
                      F.first("__lo").alias("__lo"),
                      F.first("__hi").alias("__hi")))
        w = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, 0)
        wt = Window.rowsBetween(Window.unboundedPreceding,
                                Window.unboundedFollowing)
        cum = cells.select(
            "__b", "__lo", "__hi",
            F.sum("__n").over(w).alias("nl"),
            F.sum("__p").over(w).alias("pl"),
            F.sum("__n").over(wt.orderBy("__b")).alias("nn"),
            F.sum("__p").over(wt.orderBy("__b")).alias("pp"))
        # candidate split AFTER bucket __b (left = buckets <= __b);
        # the last bucket yields no split
        nl, pl = F.col("nl").cast("double"), F.col("pl").cast("double")
        nn, pp = F.col("nn").cast("double"), F.col("pp").cast("double")
        nr, pr = nn - nl, pp - pl
        gini = lambda n, p: 2.0 * (p / n) * (1.0 - p / n)  # noqa: E731
        w_imp = (nl * gini(nl, pl) + nr * gini(nr, pr)) / nn
        cand = (cum.where((F.col("nl") < F.col("nn"))
                          & (F.col("nl") > 0))
                .select("__b", "__lo", "__hi", "nl", "nn", "pp",
                        w_imp.alias("__imp"),
                        F.round(w_imp * F.lit(1e9), 0).cast("bigint")
                        .alias("__imp_n")))
        rk = Window.orderBy(F.col("__imp_n").asc(), F.col("__b").asc())
        best = (cand.withColumn("__rk", F.row_number().over(rk))
                .where(F.col("__rk") == 1))
        nudge = F.lit(10.0 ** -(round_dp + 5))
        root = 2.0 * (pp / nn) * (1.0 - pp / nn)
        outs.append(best.select(
            F.lit(feat).alias("feature"),
            # boundary value after bucket __b
            F.round(F.col("__lo")
                    + (F.col("__b") + 1)
                    * ((F.col("__hi") - F.col("__lo")) / F.lit(float(b)))
                    + nudge, round_dp).cast("double").alias("threshold"),
            F.col("nl").cast("bigint").alias("n_left"),
            (F.col("nn") - F.col("nl")).cast("bigint").alias("n_right"),
            F.round(root + nudge, round_dp).cast("double")
            .alias("gini_root"),
            F.round(F.col("__imp") + nudge, round_dp).cast("double")
            .alias("gini_split"),
            F.round(root - F.col("__imp") + nudge, round_dp)
            .cast("double").alias("gini_gain")))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
