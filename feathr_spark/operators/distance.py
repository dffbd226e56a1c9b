"""Distribution-distance operators: two-sample KS, 1-D Wasserstein,
Jensen-Shannon divergence, Kendall's tau-b.

Data-quality / drift monitoring over 100 TB corpora needs distances
between empirical distributions without ever sorting the raw table into
one task. The numeric two-sample distances here (KS, W1) share one
scale discipline with :func:`feathr_spark.operators.stats.roc_auc`:

1. collapse to per-DISTINCT-value counts per side — the only data-sized
   shuffle; everything after is distinct-value-sized or smaller;
2. order-preserving equal-width range buckets from a broadcast min/max
   frame;
3. per-bucket totals (a ``buckets``-sized frame) become running prefix
   offsets via a window over that TINY frame;
4. the CDF at each distinct value = within-bucket running sum (window
   partitioned by bucket — parallel across buckets) + the bucket's
   offset. No task ever sorts more than one bucket.

The categorical distance (JSD) is one cell aggregate + a broadcast
pooled frame; Kendall's tau-b is a bounded self-join intended for
SERIES-sized frames (daily aggregates), the same contract as
``timeseries.theil_sen``.
"""
from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _two_sample_cdf(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
    buckets: int,
):
    """Shared KS/W1 prelude: per-distinct-value right-continuous CDFs
    of both samples, distributed-cumsum plan (no global sort).

    Returns ``(cdf_frame, bucket_frame)`` where ``cdf_frame`` has one
    row per distinct value with columns ``(__s, __b, __fa, __fb, __na,
    __nb)`` (``__fa``/``__fb`` = P(X <= __s) per side) and
    ``bucket_frame`` is the buckets-sized frame ``(__b, __bmin)`` used
    for cross-bucket gap stitching.
    """
    if buckets < 1:
        raise ValueError("buckets must be >= 1")
    g, v = F.col(group_col), F.col(value_col).cast("double")
    d = (df.where(g.isNotNull() & v.isNotNull()
                  & g.isin(group_a, group_b))
           .select((g == F.lit(group_a)).alias("__ia"),
                   v.alias("__s")))
    # 1. per-distinct-value counts for each side (the one data shuffle)
    s = (d.groupBy("__s")
          .agg(F.count_if(F.col("__ia")).alias("__ca"),
               F.count_if(~F.col("__ia")).alias("__cb")))
    # 2. range bucket from a broadcast 1-row bounds frame
    bounds = s.agg(F.min("__s").alias("__lo"), F.max("__s").alias("__hi"))
    sb = s.crossJoin(F.broadcast(bounds))
    lo, hi = F.col("__lo"), F.col("__hi")
    width = (hi - lo) / F.lit(int(buckets))
    bkt = (F.when(hi == lo, F.lit(0))
           .otherwise(F.least(F.floor((F.col("__s") - lo) / width),
                              F.lit(int(buckets) - 1)))).cast("bigint")
    sb = sb.select("__s", "__ca", "__cb", bkt.alias("__b"))
    # 3. per-bucket totals -> prefix offsets over the tiny frame
    bt = (sb.groupBy(F.lit(0).alias("__g"), "__b")
            .agg(F.sum("__ca").alias("__ba"), F.sum("__cb").alias("__bb"),
                 F.min("__s").alias("__bmin")))
    woff = (Window.partitionBy("__g").orderBy("__b")
            .rowsBetween(Window.unboundedPreceding, -1))
    wtot = Window.partitionBy("__g")
    offs = bt.select(
        "__b", "__bmin",
        F.coalesce(F.sum("__ba").over(woff), F.lit(0)).alias("__offa"),
        F.coalesce(F.sum("__bb").over(woff), F.lit(0)).alias("__offb"),
        F.sum("__ba").over(wtot).alias("__na"),
        F.sum("__bb").over(wtot).alias("__nb"))
    # 4. within-bucket running counts INCLUDING the current value
    # (right-continuous CDF) + bucket offset
    wrun = (Window.partitionBy("__b").orderBy("__s")
            .rowsBetween(Window.unboundedPreceding, 0))
    # NULL-safe denominators: an empty side yields NULL CDFs (and so a
    # NULL statistic) instead of an ANSI divide-by-zero error
    na_nz = F.when(F.col("__na") > 0, F.col("__na"))
    nb_nz = F.when(F.col("__nb") > 0, F.col("__nb"))
    cdf = (sb.join(F.broadcast(offs.drop("__bmin")), "__b")
           .select(
               "__s", "__b", "__na", "__nb", "__ca", "__cb",
               ((F.sum("__ca").over(wrun) + F.col("__offa"))
                / na_nz).alias("__fa"),
               ((F.sum("__cb").over(wrun) + F.col("__offb"))
                / nb_nz).alias("__fb")))
    return cdf, offs.select("__b", "__bmin")


def ks_2sample(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
    buckets: int = 64,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov distance between the ``value_col``
    distributions of ``group_a`` and ``group_b`` rows.

    D = max_x |F_a(x) - F_b(x)| over the merged distinct values, exact
    (buckets only partition the cumsum, they never quantize values).
    ``p_value`` is the classic asymptotic bound
    ``2 * exp(-2 * m * D^2)`` with ``m = n_a*n_b/(n_a+n_b)`` (clamped
    to 1) — portable arithmetic both engines reproduce bit-for-bit at
    4 dp.

    One data-sized shuffle (distinct-value collapse); the max is a
    single fold over the distinct-value frame. Output: 1 row
    ``(group_a, group_b, n_a, n_b, d_stat, p_value)``.
    """
    cdf, _ = _two_sample_cdf(df, group_col, value_col,
                             group_a, group_b, buckets)
    out = cdf.agg(
        F.first("__na").alias("__na"), F.first("__nb").alias("__nb"),
        F.max(F.abs(F.col("__fa") - F.col("__fb"))).alias("__d"))
    m = (F.col("__na") * F.col("__nb")
         / (F.col("__na") + F.col("__nb"))).cast("double")
    return out.select(
        F.lit(str(group_a)).alias("group_a"),
        F.lit(str(group_b)).alias("group_b"),
        F.col("__na").cast("bigint").alias("n_a"),
        F.col("__nb").cast("bigint").alias("n_b"),
        F.col("__d").cast("double").alias("d_stat"),
        F.least(F.lit(1.0),
                2.0 * F.exp(-2.0 * m * F.col("__d") * F.col("__d")))
        .cast("double").alias("p_value"))


def wasserstein_1d(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
    buckets: int = 64,
) -> DataFrame:
    """1-D Wasserstein-1 (earth mover's) distance between the two
    samples' empirical distributions:
    ``W1 = sum_i |F_a(x_i) - F_b(x_i)| * (x_{i+1} - x_i)`` over merged
    distinct values — exact, no quantization.

    The gap to the NEXT distinct value is a lead window within each
    range bucket; each bucket's last row stitches to the next bucket's
    minimum via the buckets-sized boundary frame (broadcast), so the
    plan needs no global sort and no cross-partition lookahead. The
    global maximum's gap is 0 by construction (it contributes nothing).

    Output: 1 row ``(group_a, group_b, n_a, n_b, w1)``.
    """
    cdf, bmins = _two_sample_cdf(df, group_col, value_col,
                                 group_a, group_b, buckets)
    # next bucket's min value, from the tiny boundary frame
    wb = Window.partitionBy(F.lit(0)).orderBy("__b")
    nxt = bmins.select("__b", F.lead("__bmin").over(wb).alias("__nextmin"))
    wlead = Window.partitionBy("__b").orderBy("__s")
    gap = (F.coalesce(F.lead("__s").over(wlead), F.col("__nextmin"),
                      F.col("__s"))
           - F.col("__s"))
    out = (cdf.join(F.broadcast(nxt), "__b")
           .select("__na", "__nb",
                   (F.abs(F.col("__fa") - F.col("__fb")) * gap)
                   .alias("__t"))
           .agg(F.first("__na").alias("__na"),
                F.first("__nb").alias("__nb"),
                F.sum("__t").alias("__w")))
    return out.select(
        F.lit(str(group_a)).alias("group_a"),
        F.lit(str(group_b)).alias("group_b"),
        F.col("__na").cast("bigint").alias("n_a"),
        F.col("__nb").cast("bigint").alias("n_b"),
        F.col("__w").cast("double").alias("w1"))


def js_divergence(
    df: DataFrame,
    cat_col: str,
    by: Sequence[str],
    base2: bool = True,
) -> DataFrame:
    """Jensen-Shannon divergence of each group's categorical
    distribution from the POOLED distribution (all rows), in bits by
    default (base 2 => JSD in [0, 1]).

    Plan: ONE cell aggregate (by..., cat) — the only data shuffle —
    then group totals and the category-sized pooled frame both derive
    from that cells frame (persisted against the fan-out); the pooled
    frame is broadcast back onto the cells. Categories absent from a
    group still owe their pooled-side term ``0.5 * q * log(2)``; the
    fold adds it algebraically as ``0.5 * (1 - sum of q over PRESENT
    categories)`` instead of densifying the grid.

    Output per group: ``(by..., n, jsd)``.
    """
    keys = list(by)
    if not keys:
        raise ValueError("js_divergence: `by` must name >= 1 column")
    c = F.col(cat_col)
    cells = (df.where(c.isNotNull())
               .groupBy(*keys, c.alias("__c"))
               .agg(F.count(F.lit(1)).alias("__n"))
               .persist())
    pooled = (cells.groupBy("__c").agg(F.sum("__n").alias("__qn")))
    tot = cells.agg(F.sum("__n").alias("__tot"))
    pooled = (pooled.crossJoin(F.broadcast(tot))
              .select("__c",
                      (F.col("__qn") / F.col("__tot")).alias("__q")))
    gtot = cells.groupBy(*keys).agg(F.sum("__n").alias("__gn"))
    log = F.log2 if base2 else F.log
    p = F.col("__n") / F.col("__gn")
    q = F.col("__q")
    m = (p + q) / 2
    from ._join import broadcast_attach
    terms = (broadcast_attach(
                broadcast_attach(cells, pooled, ["__c"]), gtot, keys)
             .select(*keys, "__gn",
                     (0.5 * p * log(p / m)).alias("__tp"),
                     (0.5 * q * log(q / m)).alias("__tq"),
                     q.alias("__qpres")))
    half_log2 = 0.5 * (1.0 if base2 else float(__import__("math").log(2)))
    out = (terms.groupBy(*keys)
           .agg(F.first("__gn").alias("__gn"),
                (F.sum("__tp") + F.sum("__tq")
                 + F.lit(half_log2) * (1.0 - F.sum("__qpres")))
                .alias("__jsd")))
    res = out.select(*keys,
                     F.col("__gn").cast("bigint").alias("n"),
                     F.col("__jsd").cast("double").alias("jsd"))
    from feathr_spark.operators._cache import attach_intermediates
    return attach_intermediates(res, (cells,))


def kendall_tau(
    df: DataFrame,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Kendall's tau-b rank correlation with tie correction.

    tau_b = (C - D) / sqrt((n0 - n1) * (n0 - n2)) where C/D are
    concordant/discordant pair counts, n0 = n(n-1)/2, n1/n2 = tied
    pairs within x / within y.

    O(n^2) in FRAME length — intended for series-sized inputs (daily
    aggregates; the same bounded-self-join contract as
    ``timeseries.theil_sen``): the pair join is distributed and each
    task scores a partition-sized block, but do not point it at a raw
    fact table. Output: 1 row ``(n, concordant, discordant, tau_b)``.
    """
    d = (df.where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
           .select(F.col(x_col).cast("double").alias("__x"),
                   F.col(y_col).cast("double").alias("__y"))
           .withColumn("__i", F.monotonically_increasing_id()))
    a, b = d.alias("a"), d.alias("b")
    pairs = (a.join(b, F.col("a.__i") < F.col("b.__i"))
             .select(((F.col("a.__x") - F.col("b.__x"))
                      * (F.col("a.__y") - F.col("b.__y"))).alias("__s"),
                     (F.col("a.__x") == F.col("b.__x")).alias("__tx"),
                     (F.col("a.__y") == F.col("b.__y")).alias("__ty")))
    agg = pairs.agg(
        F.count_if(F.col("__s") > 0).alias("__c"),
        F.count_if(F.col("__s") < 0).alias("__d"),
        F.count_if(F.col("__tx") & ~F.col("__ty")).alias("__n1x"),
        F.count_if(F.col("__ty") & ~F.col("__tx")).alias("__n2y"),
        F.count_if(F.col("__tx") & F.col("__ty")).alias("__nxy"))
    n = d.agg(F.count(F.lit(1)).alias("__n"))
    out = agg.crossJoin(F.broadcast(n))
    n0 = (F.col("__n") * (F.col("__n") - 1) / 2).cast("double")
    n1 = (F.col("__n1x") + F.col("__nxy")).cast("double")
    n2 = (F.col("__n2y") + F.col("__nxy")).cast("double")
    denom = F.sqrt((n0 - n1) * (n0 - n2))
    tau = F.when(denom > 0,
                 (F.col("__c") - F.col("__d")) / denom)
    return out.select(
        F.col("__n").cast("bigint").alias("n"),
        F.col("__c").cast("bigint").alias("concordant"),
        F.col("__d").cast("bigint").alias("discordant"),
        tau.cast("double").alias("tau_b"))


def cvm_2sample(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
    buckets: int = 64,
) -> DataFrame:
    """Two-sample Cramér-von Mises criterion — the integrated-square
    companion to :func:`ks_2sample` (sensitive to distribution-wide
    shape differences where KS only sees the single largest gap):

        T = (n_a * n_b / N^2) * sum_z (F_a(z) - F_b(z))^2

    summed over ALL N combined sample points (each distinct value
    weighted by its multiplicity). Same distributed-cumsum prelude —
    one data-sized shuffle, no global sort — plus one fold.

    Output: 1 row ``(group_a, group_b, n_a, n_b, t_stat)``.
    """
    cdf, _ = _two_sample_cdf(df, group_col, value_col,
                             group_a, group_b, buckets)
    diff2 = ((F.col("__fa") - F.col("__fb"))
             * (F.col("__fa") - F.col("__fb")))
    out = cdf.agg(
        F.first("__na").alias("__na"), F.first("__nb").alias("__nb"),
        F.sum(diff2 * (F.col("__ca") + F.col("__cb"))).alias("__s2"))
    n_tot = (F.col("__na") + F.col("__nb")).cast("double")
    t = (F.col("__na").cast("double") * F.col("__nb").cast("double")
         / (n_tot * n_tot) * F.col("__s2"))
    return out.select(
        F.lit(str(group_a)).alias("group_a"),
        F.lit(str(group_b)).alias("group_b"),
        F.col("__na").cast("bigint").alias("n_a"),
        F.col("__nb").cast("bigint").alias("n_b"),
        t.cast("double").alias("t_stat"))
