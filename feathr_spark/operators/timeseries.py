"""Time-series bar aggregates over event tables: OHLC and TWAP.

The standard rollups for turning an irregular event/tick stream into
fixed-interval bars — the feature shape behind price/metric dashboards
and the per-bucket inputs to the forecasting/anomaly operators. Extends
the reference surface (Azure/Feathr's window aggregations cover
SUM/AVG/MIN/MAX/LATEST, `feathr-rs/src/model.rs:198-216`; first/last-in-
bucket and duration-weighted means are not expressible there).

Scale shape: both operators are ONE map-side-combined aggregate per
bucket (OHLC) or one key-partitioned window + one aggregate (TWAP); the
raw table is scanned once, nothing data-sized shuffles twice, and no
window ever runs unpartitioned.
"""
from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ohlc_bars(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    key_cols: Sequence[str] = (),
    bucket: str = "day",
    tie_col: str = None,
    round_dp: int = 4,
) -> DataFrame:
    """Open/high/low/close bars per key per time bucket.

    Open/close are the first/last value by event time inside the bucket
    — ``min_by``/``max_by`` over a (ts, tie) struct, so ties at the same
    timestamp break deterministically on ``tie_col`` (engines disagree
    on arbitrary-tie arg_min otherwise; pass the event id). ONE
    aggregate: no window, no sort, no self-join — first/last-in-group
    via ordered aggregates is the scalable form (a row_number window
    would sort every bucket).

    Output: keys + (bucket_ts, open, high, low, close, n, total).
    """
    keys = list(key_cols)
    b = F.date_trunc(bucket, F.col(ts_col).cast("timestamp"))
    v = F.col(value_col).cast("double")
    ordk = (F.struct(F.col(ts_col).cast("timestamp"), F.col(tie_col))
            if tie_col else F.col(ts_col).cast("timestamp"))
    return (df.where(v.isNotNull())
            .groupBy(*keys, b.alias("bucket_ts"))
            .agg(F.round(F.min_by(v, ordk), round_dp).cast("double")
                 .alias("open"),
                 F.round(F.max(v), round_dp).cast("double").alias("high"),
                 F.round(F.min(v), round_dp).cast("double").alias("low"),
                 F.round(F.max_by(v, ordk), round_dp).cast("double")
                 .alias("close"),
                 F.count("*").alias("n"),
                 F.round(F.sum(F.col(value_col).cast("decimal(28,8)"))
                         .cast("double"), round_dp).cast("double")
                 .alias("total")))


def twap(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    key_cols: Sequence[str] = (),
    bucket: str = "day",
    tie_col: str = None,
    round_dp: int = 4,
) -> DataFrame:
    """Time-weighted average value per key per bucket: each observation
    holds from its timestamp until the NEXT observation in the same
    bucket (last one holds to the bucket end), weight = that duration —
    the last-observation-carried-forward integral divided by the covered
    span. The honest mean for irregularly-sampled series, where the
    arithmetic mean over-weights bursts.

    Plan: one ``lead`` window partitioned by (keys, bucket) — parallel
    across buckets, each sorts only its own bucket's rows — then one
    aggregate over the same partitioning (exchange reused). Ties order
    by ``tie_col`` (zero-duration ties contribute zero weight, so tied
    rows cannot double-count).

    Output: keys + (bucket_ts, twap, n). Buckets with a single
    observation get its value (weight = time to bucket end).
    """
    keys = list(key_cols)
    ts = F.col(ts_col).cast("timestamp")
    b = F.date_trunc(bucket, ts)
    order = [F.col("__ts")] + ([F.col(tie_col)] if tie_col else [])
    w = Window.partitionBy(*keys, "__b").orderBy(*order)
    bucket_end = F.col("__b") + F.expr(f"INTERVAL 1 {bucket}")
    base = df.where(F.col(value_col).isNotNull()).select(
        *keys, F.col(value_col).cast("double").alias("__v"),
        ts.alias("__ts"), b.alias("__b"),
        *( [F.col(tie_col)] if tie_col else [] ))
    nxt = F.coalesce(F.lead("__ts").over(w), bucket_end)
    weighted = base.select(
        *keys, "__b", "__v",
        (F.unix_micros(nxt) - F.unix_micros(F.col("__ts")))
        .cast("double").alias("__w"))
    return (weighted.groupBy(*keys, F.col("__b").alias("bucket_ts"))
            .agg(F.round(
                F.when(F.sum("__w") > 0,
                       F.sum(F.col("__v") * F.col("__w")) / F.sum("__w"))
                .otherwise(F.avg("__v")), round_dp)
                .cast("double").alias("twap"),
                F.count("*").alias("n")))


def autocorrelation(
    series: DataFrame,
    ts_col: str,
    value_col: str,
    max_lag: int = 14,
    by: Sequence[str] = (),
    round_dp: int = 4,
) -> DataFrame:
    """Sample autocorrelation function (ACF) of an already-regular
    series (one row per period per key — build it with ``ohlc_bars``/
    ``time_rollup`` first): for lag k,

        acf(k) = Σ_t (x_t − x̄)(x_{t−k} − x̄) / Σ_t (x_t − x̄)²

    — the standard biased estimator (full-series mean and variance in
    the denominator, the form whose correlogram is positive
    semi-definite and what statsmodels/R ``acf`` report). Lags are
    ROW-ordered (k steps back in the ordered series), so a calendar
    gap is the caller's modeling decision — ``gapfill`` first to treat
    missing periods as zero/interpolated.

    Plan shape: the series frame is bucket-count-sized (it already
    aggregated the raw data), so this runs entirely in window algebra
    over that tiny frame: one stats window (mean/ss per key), ONE lag
    window producing all ``max_lag`` shifted values, explode to
    (row, lag) pairs, one (keys, lag) aggregate. Nothing data-sized;
    the unpartitioned-window warning on keyless input is inherent to
    ordering a single global series.

    Output: keys + (lag, n_pairs, acf) for k = 1..max_lag; acf NULL
    when the series is constant (zero variance).
    """
    wk = Window.partitionBy(*by)
    w = Window.partitionBy(*by).orderBy(ts_col)
    x = F.col(value_col).cast("double")
    s = (series.where(x.isNotNull())
         .withColumn("__mu", F.avg(x).over(wk))
         .withColumn("__ss",
                     F.sum((x - F.col("__mu")) ** 2).over(wk)))
    # materialize the shifted values as plain columns BEFORE the
    # generator: Catalyst collapses projections, and a window lag
    # flowing through explode into the null filter is rejected
    # (UNSUPPORTED_EXPR_FOR_OPERATOR)
    s = s.select(*by, "__mu", "__ss", x.alias("__x"),
                 *[F.lag(x, k).over(w).alias(f"__p{k}")
                   for k in range(1, max_lag + 1)])
    lagged = F.array(*[
        F.struct(F.lit(k).alias("lag"), F.col(f"__p{k}").alias("prev"))
        for k in range(1, max_lag + 1)])
    pairs = (s.withColumn("__l", F.explode(lagged))
             .select(*by, "__mu", "__ss",
                     F.col("__l.lag").alias("lag"),
                     (F.col("__x") - F.col("__mu")).alias("__d"),
                     (F.col("__l.prev") - F.col("__mu")).alias("__dp"))
             .where(F.col("__dp").isNotNull()))
    return (pairs.groupBy(*by, "lag")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
                 F.round(F.when(F.first("__ss") > 0,
                                F.sum(F.col("__d") * F.col("__dp"))
                                / F.first("__ss")) + 1e-9, round_dp)
                 .cast("double").alias("acf"))
            .select(*by, F.col("lag").cast("bigint").alias("lag"),
                    "n_pairs", "acf"))


def theil_sen(
    series: DataFrame,
    ts_col: str,
    value_col: str,
    by: Sequence[str] = (),
    round_dp: int = 4,
) -> DataFrame:
    """Theil-Sen robust trend: slope = median of all pairwise slopes
    (y_j − y_i)/(x_j − x_i), intercept = median(y − slope·x). Up to
    ~29% of the points can be arbitrary outliers before the estimate
    moves — the robust replacement for :func:`ols_trend`'s
    least-squares line (one bad day drags OLS; it cannot drag a
    median).

    Input is an already-aggregated series (bucket-count-sized, like
    :func:`autocorrelation`): the pair self-join is O(n²) in the
    SERIES length, not the data — ~3M slope pairs for a decade of
    daily buckets, a trivial distributed join+median. For raw-event
    inputs aggregate first; beyond ~10⁵ series points switch to a
    sampled pair subset (same median, CLT-tight).

    Timestamps become fractional days (``x/86400000`` from epoch-ms)
    so the slope unit is per-day for date/timestamp inputs; numeric
    x passes through. Output per key: (n, slope, intercept) — exact
    interpolated medians (both engines interpolate identically on
    doubles); NULL slope for n < 2.

    EAGER with no keys: the global slope median runs through
    distributed selection (:func:`stats.selection_percentile`), which
    collects its bounded picks at CALL time — constructing the result
    DataFrame materializes the (persisted) pair frame immediately
    rather than when a downstream action fires. Grouped calls stay
    fully lazy.
    """
    keys = list(by)
    t = F.col(ts_col)
    if dict(series.dtypes)[ts_col] in ("date", "timestamp",
                                       "timestamp_ntz"):
        x = (F.unix_millis(t.cast("timestamp")).cast("double")
             / 86400000.0)
    else:
        x = t.cast("double")
    s = (series.where(t.isNotNull() & F.col(value_col).isNotNull())
         .select(*keys, x.alias("__x"),
                 F.col(value_col).cast("double").alias("__y"))
         .persist())  # pair self-join consumes it twice + residual pass
    a = s.select(*keys, F.col("__x").alias("__xa"),
                 F.col("__y").alias("__ya"))
    b = s.select(*keys, F.col("__x").alias("__xb"),
                 F.col("__y").alias("__yb"))
    cond = [F.col("__xa") < F.col("__xb")]
    if not keys:
        # the global-trend cross join streams the cached series frame,
        # which sits in ONE post-AQE partition — without a spread the
        # whole O(n^2) nested loop (and the partial median buffering
        # behind it) runs in a single task; fan the streamed side out
        # to the configured parallelism first
        n_parts = int(series.sparkSession.conf.get(
            "spark.sql.shuffle.partitions", "32"))
        a = a.repartition(n_parts)
    pairs = (a.join(b, keys) if keys else a.crossJoin(b)) \
        .where(*cond)
    sl_expr = ((F.col("__yb") - F.col("__ya"))
               / (F.col("__xb") - F.col("__xa")))
    extra = []
    if keys:
        # grouped trends: per-key series are small, the buffer-based
        # exact median is fine and stays key-partitioned
        slope = pairs.groupBy(*keys).agg(F.median(sl_expr).alias("__m"))
    else:
        # the GLOBAL pair median is where F.median breaks down: its
        # partial state is the full O(n^2) slope multiset, merged and
        # sorted in one final task (measured 10 s of an 11 s query at
        # 2.9M pairs). selection_percentile finds the same value via a
        # bucket histogram + a candidate-bucket-only sort, fully
        # parallel and interpolation-identical to Spark's Percentile.
        from .stats import selection_percentile
        sl = pairs.select(sl_expr.alias("__sl")).persist()
        extra.append(sl)  # histogram pass + candidate pass both read it
        slope = selection_percentile(sl, "__sl", 0.5) \
            .select(F.col("value").alias("__m"))
    if keys:
        j = s.join(F.broadcast(slope), keys)
    else:
        j = s.crossJoin(F.broadcast(slope))
    out = (j.groupBy(*keys)
           .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                F.first("__m").alias("__m"),
                F.median(F.col("__y") - F.col("__m") * F.col("__x"))
                .alias("__b"))
           .select(*keys, "n",
                   F.round(F.col("__m") + 1e-9, round_dp).cast("double")
                   .alias("slope"),
                   F.round(F.col("__b") + 1e-9, round_dp).cast("double")
                   .alias("intercept")))
    from ._cache import attach_intermediates
    return attach_intermediates(out, [s] + extra)


def binary_changepoint(df: DataFrame, time_col: str,
                       value_col: str) -> DataFrame:
    """Best single mean-shift changepoint (first step of binary
    segmentation / PELT): the split that maximizes the total-SSE
    reduction ``SSE_full - (SSE_left + SSE_right)``.

    Intended for SERIES-sized frames (daily/bucketed aggregates — the
    acf/theil_sen contract): one ordered prefix window yields the
    cumulative (n, sum), the 1-row totals frame is broadcast back,
    every candidate split scores row-locally, and the argmax is a
    top-1 TakeOrderedAndProject. Values quantize to 4 dp on entry
    (decimal(18,4)) and the prefix sums accumulate in DECIMAL (exact,
    order-independent).

    The score uses the expanded identity ``red = Sl²/nl + Sr²/nr −
    S²/n`` (the Σy² terms of SSE_full − SSE_l − SSE_r cancel exactly),
    so NO sum-of-squares is ever materialized.  That is a portability
    requirement, not just algebra: a decimal Σy² has scaled storage up
    to ~10²⁵ ≫ 2⁵³, and DuckDB converts decimal→double as
    (double)int128 / 10^scale — TWO roundings — while Java rounds the
    conversion correctly once, so the two engines can disagree by one
    ulp at 10¹⁷ scale (observed as a 128-absolute divergence on the
    sf0.1 daily-revenue series).  The LINEAR sums' scaled storage
    stays far below 2⁵³ where both conversion paths are exact, and the
    remaining double arithmetic is the same IEEE op sequence on both
    engines.

    Output: 1 row ``(split_t, n_left, n_right, mean_left, mean_right,
    sse_reduction)`` — NULL-free when the series has >= 2 points.
    """
    d = (df.where(F.col(time_col).isNotNull()
                  & F.col(value_col).isNotNull())
           .select(F.col(time_col).alias("__t"),
                   F.col(value_col).cast("decimal(18,4)").alias("__y")))
    w = (Window.partitionBy(F.lit(0)).orderBy("__t")
         .rowsBetween(Window.unboundedPreceding, 0))
    cum = d.select(
        "__t",
        F.row_number().over(
            Window.partitionBy(F.lit(0)).orderBy("__t")).alias("__cn"),
        F.sum("__y").over(w).alias("__cs"))
    tot = d.agg(F.count(F.lit(1)).alias("__n"),
                F.sum("__y").alias("__s"))
    c = cum.crossJoin(F.broadcast(tot)).where(F.col("__cn") < F.col("__n"))
    nl = F.col("__cn").cast("double")
    nr = (F.col("__n") - F.col("__cn")).cast("double")
    n = F.col("__n").cast("double")
    sl = F.col("__cs").cast("double")
    sr = (F.col("__s") - F.col("__cs")).cast("double")
    s = F.col("__s").cast("double")
    red = sl * sl / nl + sr * sr / nr - s * s / n
    scored = c.select("__t", "__cn", "__n",
                      (sl / nl).alias("__ml"), (sr / nr).alias("__mr"),
                      red.alias("__red"))
    top = scored.orderBy(F.col("__red").desc(), F.col("__t").asc()) \
        .limit(1)
    return top.select(
        F.col("__t").alias("split_t"),
        F.col("__cn").cast("bigint").alias("n_left"),
        (F.col("__n") - F.col("__cn")).cast("bigint").alias("n_right"),
        F.col("__ml").cast("double").alias("mean_left"),
        F.col("__mr").cast("double").alias("mean_right"),
        F.col("__red").cast("double").alias("sse_reduction"))


def seasonal_decompose(df: DataFrame, time_col: str, value_col: str,
                       period: int = 7,
                       trend_window: int = 7) -> DataFrame:
    """Classical additive seasonal decomposition (moving-average
    flavor, STL-lite): ``y = trend + seasonal + residual``.

    * trend — centered moving average over ``trend_window`` rows
      (NULL at the edges where the window is partial), accumulated as
      a DECIMAL window sum so the average is exact at any parallelism;
    * seasonal — per-phase mean of the detrended series, phase =
      (row position - 1) mod ``period`` (time-agnostic, works for any
      regular cadence); detrended values quantize to 4 dp before the
      exact DECIMAL fold;
    * residual — what's left; NULL wherever trend is NULL.

    SERIES-sized contract (daily/bucketed aggregates — acf/theil_sen):
    the ordered windows run on the bucket-bounded frame, never raw
    facts. Output: one row per input point
    ``(time_col, y, phase, trend, seasonal, residual)``.
    """
    if period < 2 or trend_window < 2:
        raise ValueError("seasonal_decompose: period and trend_window "
                         "must be >= 2")
    half = trend_window // 2
    d = (df.where(F.col(time_col).isNotNull()
                  & F.col(value_col).isNotNull())
           .select(F.col(time_col).alias("__t"),
                   F.col(value_col).cast("decimal(18,4)").alias("__y")))
    ww = (Window.partitionBy(F.lit(0)).orderBy("__t")
          .rowsBetween(-half, trend_window - half - 1))
    wn = Window.partitionBy(F.lit(0)).orderBy("__t")
    c = d.select(
        "__t", "__y",
        ((F.row_number().over(wn) - 1) % period).alias("__phase"),
        F.when(F.count("__y").over(ww) == trend_window,
               F.sum("__y").over(ww).cast("double")
               / F.lit(float(trend_window))).alias("__trend"))
    detr = F.col("__y").cast("double") - F.col("__trend")
    c = c.withColumn(
        "__dq", F.round(detr + 1e-9, 4).cast("decimal(18,4)"))
    seas = (c.where(F.col("__dq").isNotNull())
            .groupBy("__phase")
            .agg((F.sum("__dq").cast("double")
                  / F.count(F.lit(1)).cast("double")).alias("__seas")))
    out = c.join(F.broadcast(seas), "__phase", "left")
    resid = (F.col("__y").cast("double") - F.col("__trend")
             - F.col("__seas"))
    return out.select(
        F.col("__t").alias(time_col),
        F.col("__y").cast("double").alias("y"),
        F.col("__phase").cast("bigint").alias("phase"),
        F.col("__trend").cast("double").alias("trend"),
        F.col("__seas").cast("double").alias("seasonal"),
        resid.cast("double").alias("residual"))


def rolling_corr(df: DataFrame, ts_col: str, x_col: str, y_col: str,
                 window_n: int = 30) -> DataFrame:
    """Rolling Pearson correlation of two co-sampled series over the
    trailing ``window_n`` points — the co-movement monitor (price vs
    volume, revenue vs traffic).

    SERIES-sized contract (acf/theil_sen): the windowed moment sums
    run over the bucket-bounded frame. Inputs quantize to 4 dp and the
    five moments accumulate as DECIMAL window sums, so every window's
    correlation is computed from exact, order-independent inputs.
    Rows before the first full window get NULL; zero-variance windows
    get NULL.

    Output: (ts_col, x, y, corr).
    """
    if window_n < 2:
        raise ValueError("rolling_corr: window_n must be >= 2")
    d = (df.where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
           .select(F.col(ts_col).alias("__t"),
                   F.col(x_col).cast("double").alias("__xd"),
                   F.col(y_col).cast("double").alias("__yd")))
    d = d.select(
        "__t", "__xd", "__yd",
        F.round(F.col("__xd"), 4).cast("decimal(18,4)").alias("__x"),
        F.round(F.col("__yd"), 4).cast("decimal(18,4)").alias("__y"))
    w = (Window.partitionBy(F.lit(0)).orderBy("__t")
         .rowsBetween(-(window_n - 1), 0))
    wide = lambda c: F.col(c).cast("decimal(28,4)")
    m = d.select(
        "__t", "__xd", "__yd",
        F.count(F.lit(1)).over(w).alias("__n"),
        F.sum("__x").over(w).cast("double").alias("__sx"),
        F.sum("__y").over(w).cast("double").alias("__sy"),
        F.sum(wide("__x") * F.col("__x")).over(w).cast("double")
        .alias("__sxx"),
        F.sum(wide("__y") * F.col("__y")).over(w).cast("double")
        .alias("__syy"),
        F.sum(wide("__x") * F.col("__y")).over(w).cast("double")
        .alias("__sxy"))
    n = F.col("__n").cast("double")
    cov = n * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    vx = n * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    vy = n * F.col("__syy") - F.col("__sy") * F.col("__sy")
    corr = F.when((F.col("__n") == window_n) & (vx > 0) & (vy > 0),
                  cov / F.sqrt(vx * vy))
    return m.select(F.col("__t").alias(ts_col),
                    F.col("__xd").alias("x"), F.col("__yd").alias("y"),
                    corr.cast("double").alias("corr"))


def cross_correlation(df: DataFrame, ts_col: str, x_col: str,
                      y_col: str, max_lag: int = 7) -> DataFrame:
    """Lead-lag cross-correlation of two co-sampled series:
    ``ccf(k) = Σ_t (x_t - x̄)(y_{t-k} - ȳ) / (√ssx · √ssy)`` for
    k = -max_lag..max_lag (positive k: y LEADS x by k periods) — the
    standard full-series-denominator estimator, the cross-series
    sibling of ``autocorrelation`` and the same series-frame plan: one
    stats window, one lag/lead projection emitting all 2k+1 shifted
    values, explode, one (lag) aggregate.

    Output: (lag, n_pairs, ccf); NULL when either series is constant.
    """
    wk = Window.partitionBy(F.lit(0))
    w = Window.partitionBy(F.lit(0)).orderBy(ts_col)
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    s = (df.where(x.isNotNull() & y.isNotNull())
         .withColumn("__mx", F.avg(x).over(wk))
         .withColumn("__my", F.avg(y).over(wk))
         .withColumn("__ssx", F.sum((x - F.col("__mx")) ** 2).over(wk))
         .withColumn("__ssy", F.sum((y - F.col("__my")) ** 2).over(wk)))
    lags = list(range(-max_lag, max_lag + 1))
    s = s.select(
        "__mx", "__my", "__ssx", "__ssy", x.alias("__x"),
        *[F.lag(y, k).over(w).alias(f"__p{k + max_lag}") for k in lags])
    arr = F.array(*[
        F.struct(F.lit(k).alias("lag"),
                 F.col(f"__p{k + max_lag}").alias("prev"))
        for k in lags])
    pairs = (s.withColumn("__l", F.explode(arr))
             .select("__mx", "__my", "__ssx", "__ssy",
                     F.col("__l.lag").alias("lag"),
                     (F.col("__x") - F.col("__mx")).alias("__d"),
                     (F.col("__l.prev") - F.col("__my")).alias("__dp"))
             .where(F.col("__dp").isNotNull()))
    return (pairs.groupBy("lag")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
                 F.when((F.first("__ssx") > 0) & (F.first("__ssy") > 0),
                        F.sum(F.col("__d") * F.col("__dp"))
                        / (F.sqrt(F.first("__ssx"))
                           * F.sqrt(F.first("__ssy"))))
                 .cast("double").alias("ccf"))
            .select(F.col("lag").cast("bigint").alias("lag"),
                    "n_pairs", "ccf"))


def ewma_smooth(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    key_cols: Sequence[str] = (),
    bucket: str = "day",
    alpha: float = 0.3,
) -> DataFrame:
    """Exponentially weighted moving average over per-key time buckets:
    ``s_1 = x_1; s_t = alpha*x_t + (1-alpha)*s_{t-1}`` (the
    ``adjust=False`` recursive form every monitoring stack uses).

    The raw table collapses to (key, bucket) DECIMAL-exact sums in ONE
    map-side-combined aggregate — the only data-sized shuffle — then
    the recursion runs per key over the bucket-bounded series via
    Arrow-batched ``applyInPandas`` (the ``theil_sen`` series
    contract: series length is bounded by the time range / bucket
    granularity, never by table size, so per-key state is constant and
    keys parallelize freely on a cluster). The recursion itself is not
    expressible as a Spark window without overflowing ``(1-alpha)^-t``
    rescaling past ~10^3 buckets; a bounded Python stage is the honest
    form. IEEE double ops in bucket order are deterministic at any
    parallelism.

    Output: keys + ``(bucket_ts, bucket_value, ewma)``.
    """
    keys = list(key_cols)
    b = F.date_trunc(bucket, F.col(ts_col).cast("timestamp"))
    vdec = F.col(value_col).cast("decimal(28,6)")
    series = (df.where(F.col(value_col).isNotNull())
              .groupBy(*keys, b.alias("bucket_ts"))
              .agg(F.sum(vdec).cast("double").alias("bucket_value")))
    a = float(alpha)

    out_fields = [series.schema[c] for c in series.columns]
    from pyspark.sql.types import DoubleType, StructField, StructType
    schema = StructType(out_fields + [StructField("ewma", DoubleType())])

    def smooth(pdf):
        pdf = pdf.sort_values("bucket_ts").reset_index(drop=True)
        s, out = None, []
        for x in pdf["bucket_value"]:
            s = x if s is None else a * x + (1.0 - a) * s
            out.append(s)
        pdf["ewma"] = out
        return pdf

    grouped = series.groupBy(*keys) if keys else \
        series.groupBy(F.lit(1).alias("__g"))
    res = grouped.applyInPandas(smooth, schema=schema)
    return res.select(*keys, "bucket_ts", "bucket_value", "ewma")


def period_growth(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    key_cols: Sequence[str] = (),
    bucket: str = "month",
    lag: int = 1,
) -> DataFrame:
    """Period-over-period growth (MoM with ``bucket='month', lag=1``;
    YoY with ``bucket='month', lag=12``): per-key bucketed DECIMAL-exact
    sums, then ``growth_pct = (v - v_prev) / |v_prev|`` against the
    value ``lag`` buckets earlier.

    ONE map-side-combined aggregate over the raw table; the lag window
    partitions by key over the bucket-count-sized frame (never the data
    table). The lag is positional over EXISTING buckets — callers who
    need calendar-exact lags over gappy series should gap-fill first
    (``profile.gapfill``). First ``lag`` buckets and zero-previous
    buckets yield NULL growth. Output: keys + ``(bucket_ts, value,
    prev_value, growth_pct)``.
    """
    keys = list(key_cols)
    b = F.date_trunc(bucket, F.col(ts_col).cast("timestamp"))
    vdec = F.col(value_col).cast("decimal(28,6)")
    series = (df.where(F.col(value_col).isNotNull())
              .groupBy(*keys, b.alias("bucket_ts"))
              .agg(F.sum(vdec).alias("__v")))
    w = Window.partitionBy(*[F.col(c) for c in keys]) \
        .orderBy("bucket_ts") if keys else \
        Window.partitionBy(F.lit(1)).orderBy("bucket_ts")
    prev = F.lag(F.col("__v"), lag).over(w)
    growth = F.when(F.abs(prev) > 0,
                    (F.col("__v") - prev).cast("double")
                    / F.abs(prev).cast("double"))
    return series.select(
        *keys, "bucket_ts",
        F.col("__v").cast("double").alias("value"),
        prev.cast("double").alias("prev_value"),
        growth.alias("growth_pct"))
