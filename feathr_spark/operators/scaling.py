"""Feature scaling / outlier handling: winsorize, standardize, correlations.

Classic model-input preparation over the feature frames this engine
produces (the reference's transformation DSL, ``feathr-rs/src/model.rs:
248-253``, is raw SQL expressions — these are the aggregate-parameterized
transforms that a single row-local expression cannot express, because the
clip bounds / moments are themselves corpus statistics).

Scale design: every operator here is a two-phase plan — ONE aggregate pass
computing a tiny per-group statistics frame (exact percentiles or moment
sums), then ONE broadcast join attaching the statistics back for the
row-local transform. The data table is scanned once, never shuffled (the
stats shuffle moves only group cardinality rows); at 100 TB the transform
stays embarrassingly parallel. ``corr_matrix`` is a single aggregate pass
producing sum/sum-of-product moments for all column pairs at once (one
scan for the whole matrix, constant state).
"""
from __future__ import annotations

from itertools import combinations
from typing import List, Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _check_percentile_mode(mode: str, keys: Sequence[str], op: str) -> None:
    """Shared knob validation (matches funnel_latency / rfm_scores):
    an unknown mode or a selection request alongside grouping keys must
    raise, not silently run the buffer plan — at the scale where the
    selection path matters, a typo that quietly changes the plan is a
    production incident, not a default."""
    if mode not in ("buffer", "selection"):
        raise ValueError(
            f"{op}: unknown percentile_mode {mode!r} "
            "(expected 'buffer' or 'selection')")
    if mode == "selection" and keys:
        raise ValueError(
            f"{op}: percentile_mode='selection' is the GLOBAL-percentile "
            "scale path and cannot be combined with `by` keys — grouped "
            "percentiles already bound each aggregate buffer by the "
            "group size, so use the default buffer mode")


def winsorize(
    df: DataFrame,
    value_col: str,
    p_lo: float = 0.01,
    p_hi: float = 0.99,
    by: Optional[Sequence[str]] = None,
    percentile_mode: str = "buffer",
) -> DataFrame:
    """Clip ``value_col`` into its exact [p_lo, p_hi] percentile band,
    optionally per ``by`` group (PERCENTILE_CONT interpolation, matching
    the PERCENTILE window aggregation's convention).

    Adds ``{col}_wins`` plus the bound columns ``{col}_lo``/``{col}_hi``;
    NULL values pass through NULL. Groups absent from the stats frame
    cannot occur (stats come from the same frame).

    ``percentile_mode='selection'`` (global only, validated) runs the
    distributed-selection percentile passes EAGERLY at call time (see
    :func:`stats.selection_percentiles`), unlike the default lazy plan.
    """
    if not (0.0 <= p_lo <= p_hi <= 1.0):
        raise ValueError("winsorize: need 0 <= p_lo <= p_hi <= 1")
    keys = list(by or [])
    _check_percentile_mode(percentile_mode, keys, "winsorize")
    v = F.col(value_col)
    stats_agg = [
        F.percentile(v, F.lit(float(p_lo))).alias("__lo"),
        F.percentile(v, F.lit(float(p_hi))).alias("__hi"),
    ]
    from ._join import broadcast_attach
    if keys:
        stats = df.groupBy(*keys).agg(*stats_agg)
        joined = broadcast_attach(df, stats, keys, "left")
    elif percentile_mode == "selection":
        # GLOBAL exact percentiles without buffering the value multiset
        # in one reduce task (see stats.selection_percentiles) — values
        # are bit-identical to the buffer aggregate; the bounds become
        # plan literals (two extra scan passes, zero extra shuffles)
        from .stats import selection_percentiles
        lo_v, hi_v = selection_percentiles(
            df.where(v.isNotNull()), value_col, [p_lo, p_hi])
        joined = (df.withColumn("__lo", F.lit(lo_v).cast("double"))
                    .withColumn("__hi", F.lit(hi_v).cast("double")))
    else:
        stats = df.agg(*stats_agg)
        joined = df.crossJoin(F.broadcast(stats))
    clipped = F.when(v.isNull(), F.lit(None).cast("double")) \
        .otherwise(F.least(F.greatest(v.cast("double"), F.col("__lo")),
                           F.col("__hi")))
    return joined.withColumn(f"{value_col}_wins", clipped) \
        .withColumnRenamed("__lo", f"{value_col}_lo") \
        .withColumnRenamed("__hi", f"{value_col}_hi")


def standardize(
    df: DataFrame,
    value_cols: Sequence[str],
    by: Optional[Sequence[str]] = None,
    ddof: int = 0,
) -> DataFrame:
    """Z-score columns (``(x - mean) / std``), optionally per group.

    Moments are computed as exact decimal sums (order-independent, so the
    result is bit-stable across partitionings — the same discipline as
    profile_numeric), converted to double only at the divide. ``ddof=0``
    is population std (``ddof=1`` sample). Zero-variance groups yield
    NULL z-scores (no division by 0). Adds ``{col}_z`` per column.
    """
    keys = list(by or [])
    aggs: List = []
    for c in value_cols:
        d = F.col(c).cast("decimal(28,8)")
        aggs += [F.count(F.col(c)).alias(f"__n_{c}"),
                 F.sum(d).alias(f"__s_{c}"),
                 F.sum(d * d).alias(f"__ss_{c}")]
    from ._join import broadcast_attach
    if keys:
        stats = df.groupBy(*keys).agg(*aggs)
        out = broadcast_attach(df, stats, keys, "left")
    else:
        stats = df.agg(*aggs)
        out = df.crossJoin(F.broadcast(stats))
    for c in value_cols:
        n = F.col(f"__n_{c}").cast("double")
        s = F.col(f"__s_{c}").cast("double")
        ss = F.col(f"__ss_{c}").cast("double")
        mean = s / n
        var = (ss - s * s / n) / F.when(n > ddof, n - ddof)
        std = F.sqrt(var)
        out = out.withColumn(
            f"{c}_z",
            F.when(std > 0, (F.col(c).cast("double") - mean) / std))
    return out.drop(*[f"__{p}_{c}" for c in value_cols
                      for p in ("n", "s", "ss")])


def corr_matrix(df: DataFrame, value_cols: Sequence[str]) -> DataFrame:
    """Pairwise Pearson correlations of ``value_cols`` in ONE aggregate
    pass: per-pair sum/sum-of-squares/cross-product moments accumulate in
    a single scan with constant state (no per-pair jobs, no shuffle of the
    data table — the classic moment-matrix formulation).

    Rows where EITHER column of a pair is NULL are excluded from that
    pair (pairwise-complete semantics, like ``corr()`` in SQL engines).
    Output: (col_a, col_b, corr, n) for a < b in the given order.
    """
    cols = list(value_cols)
    aggs = []
    for a, b in combinations(cols, 2):
        ca, cb = F.col(a).cast("double"), F.col(b).cast("double")
        ok = ca.isNotNull() & cb.isNotNull()
        xa, xb = F.when(ok, ca), F.when(ok, cb)
        pre = f"__{a}__{b}"
        aggs += [F.count(xa).alias(f"{pre}_n"),
                 F.sum(xa).alias(f"{pre}_sa"),
                 F.sum(xb).alias(f"{pre}_sb"),
                 F.sum(xa * xa).alias(f"{pre}_saa"),
                 F.sum(xb * xb).alias(f"{pre}_sbb"),
                 F.sum(xa * xb).alias(f"{pre}_sab")]
    moments = df.agg(*aggs)
    pair_rows = []
    for a, b in combinations(cols, 2):
        pre = f"__{a}__{b}"
        n = F.col(f"{pre}_n").cast("double")
        sa, sb = F.col(f"{pre}_sa"), F.col(f"{pre}_sb")
        saa, sbb = F.col(f"{pre}_saa"), F.col(f"{pre}_sbb")
        sab = F.col(f"{pre}_sab")
        cov = sab - sa * sb / n
        va = saa - sa * sa / n
        vb = sbb - sb * sb / n
        r = F.when((va > 0) & (vb > 0), cov / F.sqrt(va * vb))
        pair_rows.append(F.struct(
            F.lit(a).alias("col_a"), F.lit(b).alias("col_b"),
            r.alias("corr"), F.col(f"{pre}_n").alias("n")))
    return (moments
            .select(F.explode(F.array(*pair_rows)).alias("p"))
            .select("p.col_a", "p.col_b", "p.corr", "p.n"))


def quantile_bins(
    df: DataFrame,
    value_col: str,
    bins: int = 10,
    by: Optional[Sequence[str]] = None,
    round_cuts_dp: Optional[int] = None,
    percentile_mode: str = "buffer",
) -> DataFrame:
    """Quantile discretization: assign each value its equal-frequency
    bucket in [0, bins), optionally per group — the distribution-robust
    binning for model features (deciles for bins=10).

    Cut points are the exact interior percentiles (PERCENTILE_CONT);
    bucket = number of cut points STRICTLY below the value, so ties on a
    cut point fall into the lower bucket and the mapping is deterministic
    and engine-portable (no ntile: a global ``ntile`` window needs a
    single-partition sort of the whole table, and its tie-breaking is
    row-order dependent — the classic unscalable/unstable formulation).
    The boundaries frame is group-cardinality-sized and broadcasts; the
    data table is scanned once and never shuffled. NULL values get a NULL
    bucket.

    ``round_cuts_dp`` rounds each interpolated cut point (with the
    repo-wide ``+1e-9`` half-up nudge) before comparison — REQUIRED when
    the values themselves are dp-rounded and engine portability matters:
    interpolating between two EQUAL values returns exactly that value
    under Spark's ``a + (b-a)·d`` but drifts ~1e-15 under DuckDB's
    ``(1-d)·a + d·b``, silently flipping the bucket of every row sitting
    exactly on a cut.

    Adds ``{col}_bin`` (bigint). ``percentile_mode='selection'``
    (global only, validated) computes the cut literals EAGERLY at call
    time (see :func:`stats.selection_percentiles`).
    """
    if bins < 2:
        raise ValueError("quantile_bins: need bins >= 2")
    keys = list(by or [])
    _check_percentile_mode(percentile_mode, keys, "quantile_bins")
    v = F.col(value_col)
    fracs = [i / bins for i in range(1, bins)]
    def _cut(f):
        c = F.percentile(v, F.lit(f))
        if round_cuts_dp is not None:
            c = F.round(c + F.lit(1e-9), round_cuts_dp)
        return c
    cuts = F.array(*[_cut(f) for f in fracs]).alias("__cuts")
    from ._join import broadcast_attach
    if keys:
        stats = df.groupBy(*keys).agg(cuts)
        joined = broadcast_attach(df, stats, keys, "left")
    elif percentile_mode == "selection":
        # GLOBAL cuts via distributed selection (bit-identical values;
        # no task holds the value multiset). The literals run through
        # the SAME F.round nudge expression as the aggregate path, so
        # boundary rounding is bit-identical too.
        from .stats import selection_percentiles
        cut_vals = selection_percentiles(
            df.where(v.isNotNull()), value_col, fracs)

        def _lit_cut(val):
            c = F.lit(val).cast("double")
            if round_cuts_dp is not None:
                c = F.round(c + F.lit(1e-9), round_cuts_dp)
            return c

        joined = df.withColumn(
            "__cuts", F.array(*[_lit_cut(cv) for cv in cut_vals]))
    else:
        stats = df.agg(cuts)
        joined = df.crossJoin(F.broadcast(stats))
    vd = v.cast("double")
    bucket = F.when(v.isNotNull(), F.aggregate(
        F.col("__cuts"), F.lit(0),
        lambda acc, c: acc + F.when(vd > c, 1).otherwise(0)))
    return joined.withColumn(f"{value_col}_bin",
                             bucket.cast("bigint")).drop("__cuts")


def percentile_rank(
    df: DataFrame,
    value_col: str,
    by: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Empirical-CDF transform: each row's percentile rank within its
    group — ``(rank - 1) / (n - 1)`` (SQL ``percent_rank`` semantics:
    ties share a rank, single-row groups get 0.0). The
    distribution-free normalization that maps any feature onto [0, 1].

    One shuffle (the per-group sort window); NULL values get NULL rank
    and do not count toward n. Adds ``{col}_pct``. Per-group history
    sorts in one task (the usual window skew caveat); with ``by=None``
    the WHOLE frame sorts in one task — global CDFs are for dimension-
    sized frames only, group at scale.
    """
    from pyspark.sql import Window
    keys = list(by or [])
    v = F.col(value_col)
    w = Window.partitionBy(*keys)
    # built from rank + non-null count, NOT percent_rank: percent_rank's
    # n-1 denominator counts NULL rows. With nulls sorted last, non-null
    # rows' ranks are unaffected, and count(v) ignores nulls.
    rk = F.rank().over(w.orderBy(v.asc_nulls_last()))
    n = F.count(v).over(w)
    pct = F.when(v.isNull(), F.lit(None).cast("double")) \
        .when(n > 1, (rk - 1).cast("double") / (n - 1)) \
        .otherwise(F.lit(0.0))
    return df.withColumn(f"{value_col}_pct", pct)


def robust_scale(
    df: DataFrame,
    value_col: str,
    id_col: str,
    by: Sequence[str] = (),
    round_dp: int = 4,
    percentile_mode: str = "buffer",
    round_cuts_dp: Optional[int] = None,
) -> DataFrame:
    """Median/IQR scaling: (v − median) / (q75 − q25) — the outlier-proof
    cousin of :func:`standardize` (a single 10⁹ outlier shifts a z-score's
    mean and explodes its σ; quartiles barely move). The per-group cuts
    come from ONE exact-percentile aggregate (doc-sized frame, broadcast
    back); the scan stays data-sized and single-pass like the other
    scalers here.

    Output: ``by`` + (``id_col``, value, robust) — rows whose group has
    zero IQR get NULL robust (scale undefined; gate or impute downstream).
    ``percentile_mode='selection'`` (global only, validated) computes
    the quartile literals EAGERLY at call time.

    ``round_cuts_dp`` quantizes the three quartiles to that many decimal
    places BEFORE the quotient. Linear-interpolated percentiles are the
    one place engines legitimately differ by an ulp (``lo + d·(hi−lo)``
    evaluation order varies), and a 1-ulp quartile drift survives any
    final-rounding nudge because it perturbs the quotient itself. When
    the input is a fixed-scale decimal (k dp) the true quartile has at
    most k+2 dp (the interpolation fraction is i/4), so rounding cuts at
    k+2 dp makes the quotient inputs bit-identical across engines while
    changing nothing mathematically. Mirror the same ``ROUND(q, dp)`` in
    any cross-engine oracle.
    """
    keys = list(by)
    _check_percentile_mode(percentile_mode, keys, "robust_scale")
    v = F.col(value_col).cast("double")
    from ._join import broadcast_attach
    if not keys and percentile_mode == "selection":
        # GLOBAL quartiles via distributed selection (bit-identical;
        # no task holds the value multiset)
        from .stats import selection_percentiles
        q1v, medv, q3v = selection_percentiles(
            df.where(v.isNotNull()), value_col, [0.25, 0.5, 0.75])
        j = (df.withColumn("__q1", F.lit(q1v).cast("double"))
               .withColumn("__med", F.lit(medv).cast("double"))
               .withColumn("__q3", F.lit(q3v).cast("double")))
    else:
        cuts = (df.where(v.isNotNull())
                .groupBy(*keys)
                .agg(F.expr(f"percentile({value_col}, 0.25)")
                     .alias("__q1"),
                     F.expr(f"percentile({value_col}, 0.5)")
                     .alias("__med"),
                     F.expr(f"percentile({value_col}, 0.75)")
                     .alias("__q3")))
        j = broadcast_attach(df, cuts, keys)  # null-safe: NULL-key
    if round_cuts_dp is not None:
        # plain round, no nudge: true cuts sit on the k+2-dp grid, never
        # on a round_cuts_dp+1 half-boundary, so both engines land on
        # the identical double
        for c in ("__q1", "__med", "__q3"):
            j = j.withColumn(c, F.round(F.col(c), round_cuts_dp))
    iqr = F.col("__q3") - F.col("__q1")       # groups are scored
    robust = F.when(iqr > 0, (v - F.col("__med")) / iqr)
    # +1e-9 nudge (repo-wide rounding convention): Spark rounds the
    # shortest-decimal-string repr, other engines round the binary
    # double, so a quotient sitting on a .00005 boundary flips between
    # engines without it (r7 driver lesson: robust_scale_price).
    # + 0.0 after the round normalizes IEEE signed zero (-0.0 -> +0.0)
    # so both engines emit the same bit pattern for rows whose robust
    # score rounds to zero from below (Spark's BigDecimal round already
    # yields +0.0; this is belt-and-braces mirroring the oracle)
    return j.select(
        *keys, F.col(id_col),
        (F.round(v + F.lit(1e-9), round_dp) + F.lit(0.0))
        .cast("double").alias("value"),
        (F.round(robust + F.lit(1e-9), round_dp) + F.lit(0.0))
        .cast("double").alias("robust"))


def mad_outliers(
    df: DataFrame,
    value_col: str,
    by: Sequence[str] = (),
    k: float = 3.5,
    consistency: float = 1.4826,
    percentile_mode: str = "buffer",
) -> DataFrame:
    """Robust outlier flags via the median absolute deviation (the
    Iglewicz–Hoaglin robust z-score): ``robust_z = (x - median) /
    (consistency * MAD)``, flagged when ``|robust_z| > k``.

    Unlike the mean/std z-score (``standardize``), a few extreme values
    cannot drag the cut — median and MAD have a 50% breakdown point,
    which is the point of an outlier detector. Two exact-percentile
    aggregate passes (the MAD's median-of-deviations depends on the
    group median, so a second pass is irreducible); both group frames
    are group-count-sized and broadcast back onto the single-scan
    lineage — the ``winsorize`` attach discipline. Exact interpolated
    medians (`percentile`) match DuckDB/Postgres ``quantile_cont``.

    Zero-MAD groups (over half the group identical) yield NULL
    ``robust_z`` and never flag. Output: input columns +
    ``(grp_median, grp_mad, robust_z, is_outlier)``.

    Group keys are matched null-safely (``<=>``), so rows whose key is
    NULL form a scored group like any other instead of silently falling
    out of the equi-join (they already formed a ``groupBy`` group).
    ``percentile_mode='selection'`` (global only, validated) runs its
    two selection rounds EAGERLY at call time.
    """
    from ._join import broadcast_attach
    keys = list(by)
    _check_percentile_mode(percentile_mode, keys, "mad_outliers")
    v = F.col(value_col).cast("double")
    if not keys and percentile_mode == "selection":
        # GLOBAL median/MAD via distributed selection (bit-identical;
        # no task holds the value multiset); two selection rounds
        # because the MAD's deviations depend on the median
        from .stats import selection_percentiles
        nn = df.where(v.isNotNull())
        medv = selection_percentiles(nn, value_col, [0.5])[0]
        dev = nn.select(F.abs(v - F.lit(medv).cast("double"))
                        .alias("__dev"))
        madv = selection_percentiles(dev, "__dev", [0.5])[0]
        j = (df.withColumn("__med", F.lit(medv).cast("double"))
               .withColumn("__mad", F.lit(madv).cast("double")))
    else:
        med = (df.where(v.isNotNull())
               .groupBy(*keys)
               .agg(F.percentile(v, F.lit(0.5)).alias("__med")))
        withmed = broadcast_attach(df, med, keys)
        mad = (withmed.where(v.isNotNull())
               .groupBy(*keys)
               .agg(F.percentile(F.abs(v - F.col("__med")), F.lit(0.5))
                    .alias("__mad")))
        j = broadcast_attach(withmed, mad, keys)
    z = F.when(F.col("__mad") > 0,
               (v - F.col("__med")) / (F.lit(consistency)
                                       * F.col("__mad")))
    return (j.withColumn("grp_median", F.col("__med"))
            .withColumn("grp_mad", F.col("__mad"))
            .withColumn("robust_z", z)
            .withColumn("is_outlier",
                        F.coalesce(F.abs(z) > F.lit(k), F.lit(False)))
            .drop("__med", "__mad"))


def lorenz_curve(
    df: DataFrame,
    key_col: str,
    value_col: str,
    buckets: int = 10,
) -> DataFrame:
    """Lorenz curve points over per-key totals: population deciles (by
    total value, exact percentile cuts — no global sort) vs their
    cumulative share of the total — the curve whose area complement is
    the Gini coefficient (``stats.gini_by``); the inequality readout
    for revenue/traffic/token-budget concentration.

    Per-key totals collapse once (data-sized shuffle), bucket
    membership comes from the broadcast percentile-cut frame
    (:func:`quantile_bins`' count-strictly-below rule), and the
    cumulative sums run over the BUCKETS-sized frame only. Value sums
    stay DECIMAL end to end. Output, one row per non-empty bucket in
    ascending value order: ``(bucket, n_keys, cum_pop_frac,
    cum_value_frac)``.
    """
    # persisted: quantile_bins reads the per-key frame twice (the
    # percentile-cut aggregate and the bucket-attach join)
    per = (df.where(F.col(value_col).isNotNull())
           .groupBy(F.col(key_col).alias("__k"))
           .agg(F.sum(F.col(value_col).cast("decimal(28,8)"))
                .alias("__v"))
           .persist())
    b = quantile_bins(per, "__v", bins=buckets, round_cuts_dp=6)
    agg = (b.groupBy(F.col("__v_bin").alias("bucket"))
           .agg(F.count(F.lit(1)).alias("__n"),
                F.sum("__v").alias("__s")))
    w = (Window.orderBy("bucket")
         .rowsBetween(Window.unboundedPreceding, 0))
    tot = (Window.rowsBetween(Window.unboundedPreceding,
                              Window.unboundedFollowing))
    res = agg.select(
        F.col("bucket").cast("bigint").alias("bucket"),
        F.col("__n").cast("bigint").alias("n_keys"),
        (F.sum("__n").over(w).cast("double")
         / F.sum("__n").over(tot).cast("double")).alias("cum_pop_frac"),
        (F.sum("__s").over(w).cast("double")
         / F.sum("__s").over(tot).cast("double"))
        .alias("cum_value_frac"))
    from feathr_spark.operators._cache import attach_intermediates
    return attach_intermediates(res, (per,))
