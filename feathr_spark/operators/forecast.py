"""Seasonal-naive baseline forecasting over event streams.

The standard first forecast every metrics platform ships: project each
key's next ``horizon`` buckets from its per-season-slot historical mean
(hour-of-day, day-of-week, ...), with a hierarchical fallback to the
global slot mean for (key, slot) combinations never observed. This is
deliberately a BASELINE (the thing fancier models must beat), chosen
because it is exactly reproducible in portable SQL — no solver state, no
iteration, no RNG.

Scale design: ONE shuffle of the raw table into (key, slot) partials
(map-side combined); the global-slot fallback re-aggregates those
partials (slot-cardinality rows); the forecast grid explodes
``horizon`` rows per key from the per-key last-bucket frame and joins
the two small mean frames (broadcast — they are key*slot / slot sized).
The raw table is scanned exactly once.
"""
from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def seasonal_forecast(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    bucket_s: int = 3600,
    period_s: int = 86400,
    horizon: int = 24,
) -> DataFrame:
    """Forecast the next ``horizon`` buckets per key as the key's
    historical mean for that season slot (slot = bucket index modulo
    ``period_s / bucket_s``), falling back to the all-keys slot mean
    where the key never produced data in that slot.

    Means are exact decimal (order-independent); output values are
    doubles. Output: keys + ``bucket_start`` + ``slot`` + ``forecast`` +
    ``from_fallback`` (true where the global mean was used).
    """
    if period_s % bucket_s != 0:
        raise ValueError("seasonal_forecast: period_s must be a "
                         "multiple of bucket_s")
    slots = period_s // bucket_s
    keys = list(key_cols)
    b = F.floor(F.unix_timestamp(F.col(ts_col).cast("timestamp"))
                / F.lit(int(bucket_s)))
    base = df.select(*keys, b.alias("__b"),
                     F.col(value_col).cast("decimal(18,6)").alias("__v"))
    per_bucket = (base.groupBy(*keys, "__b")
                  .agg(F.sum("__v").alias("__s"),
                       F.count("__v").alias("__n")))
    slot_col = F.pmod(F.col("__b"), F.lit(int(slots)))
    # per-(key, slot) mean over BUCKET means? No: over raw values —
    # sum/count partials re-aggregate exactly.
    # exact decimal total cast to double, then ONE IEEE division — the
    # bit-stable mean formulation (decimal division scale is engine-
    # specific; see profile_numeric)
    key_slot = (per_bucket
                .groupBy(*keys, slot_col.alias("slot"))
                .agg((F.sum("__s").cast("double") / F.sum("__n"))
                     .alias("__km")))
    global_slot = (per_bucket
                   .groupBy(slot_col.alias("slot"))
                   .agg((F.sum("__s").cast("double") / F.sum("__n"))
                        .alias("__gm")))
    last = per_bucket.groupBy(*keys).agg(F.max("__b").alias("__last"))
    grid = last.select(
        *keys,
        F.explode(F.sequence(F.col("__last") + 1,
                             F.col("__last") + int(horizon)))
        .alias("__fb"))
    grid = grid.withColumn("slot", F.pmod(F.col("__fb"), F.lit(int(slots))))
    from ._join import broadcast_attach
    out = broadcast_attach(
        broadcast_attach(grid, key_slot, keys + ["slot"], "left"),
        global_slot, ["slot"], "left")
    return out.select(
        *keys,
        F.timestamp_seconds(F.col("__fb") * int(bucket_s))
        .alias("bucket_start"),
        F.col("slot").cast("bigint").alias("slot"),
        F.coalesce(F.col("__km"), F.col("__gm")).alias("forecast"),
        F.col("__km").isNull().alias("from_fallback"))


def cusum_changepoints(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    key_cols: Sequence[str] = (),
    bucket: str = "day",
    round_dp: int = 4,
) -> DataFrame:
    """CUSUM mean-shift detector over a bucketed series: the cumulative
    sum of standardized deviations S_t = Σ_{i≤t} (x_i − x̄)/σ peaks at
    a change point (Page's classic statistic, the no-tuning form every
    metrics platform ships first). |S| near 0 everywhere = stable mean;
    the argmax |S| bucket is the best single change-point estimate.

    Plan: the raw table collapses in ONE map-side-combined aggregate to
    (keys, bucket) sums; mean/σ per key come from a second aggregate
    over that BUCKET-sized frame, joined back broadcast; the running
    sum is a window PARTITIONED by the keys (parallel across keys;
    within one key the series length is bucket-granularity-bounded —
    ~365 rows/year at "day" — so the per-key sort is trivially small,
    never data-sized). With no keys the single window is over that same
    bucket-bounded series, not the raw data.

    Output: keys + (bucket_ts, value, cusum, is_peak) — ``is_peak``
    marks the max-|S| bucket per key.
    """
    keys = list(key_cols)
    b = F.date_trunc(bucket, F.col(ts_col).cast("timestamp"))
    series = (df.groupBy(*keys, b.alias("bucket_ts"))
              .agg(F.sum(F.col(value_col).cast("decimal(28,8)"))
                   .alias("__v")))
    stats = series.groupBy(*keys).agg(
        F.avg(F.col("__v").cast("double")).alias("__mu"),
        F.stddev_samp(F.col("__v").cast("double")).alias("__sd"),
    )
    from ._join import broadcast_attach
    joined = broadcast_attach(series, stats, keys)  # null-safe keys
    dev = (F.col("__v").cast("double") - F.col("__mu")) / \
        F.when(F.col("__sd") > 0, F.col("__sd"))
    w = Window.partitionBy(*keys).orderBy("bucket_ts") \
        .rowsBetween(Window.unboundedPreceding, 0)
    wk = Window.partitionBy(*keys)
    cusum = F.sum(dev).over(w)
    out = joined.select(
        *keys, "bucket_ts",
        F.col("__v").cast("double").alias("value"),
        # + 0.0 normalizes IEEE -0.0 (the final CUSUM row is 0 by
        # construction and rounds to a signed zero engine-dependently)
        (F.round(cusum, round_dp) + F.lit(0.0)).cast("double")
        .alias("cusum"))
    peak = F.max(F.abs(F.col("cusum"))).over(wk)
    return out.withColumn(
        "is_peak", (F.abs(F.col("cusum")) == peak) & peak.isNotNull())


def seasonal_naive_eval(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    bucket_s: int = 86400,
    season: int = 7,
    holdout: int = 30,
) -> DataFrame:
    """Holdout evaluation of the seasonal-naive forecaster (predict
    bucket t with the actual from bucket t − season): MAE, sMAPE and
    MASE over the last ``holdout`` buckets — the honest yardstick any
    fancier forecaster must beat (MASE < 1 = better than this
    baseline on its own training data; Hyndman & Koehler 2006).

    The raw table collapses to the bucket series in one DECIMAL-exact
    aggregate (the only data-sized shuffle); the seasonal lag, the
    train/test split and both error folds run over the BUCKET-COUNT-
    sized series frame (lag window ordered over a single global series
    — inherently one partition, bounded by the date range, never the
    raw table). MASE's scale is the TRAIN-side mean absolute seasonal
    difference; a zero scale (perfectly periodic train) yields NULL
    mase rather than infinity.

    Output (1 row): ``(n_train, n_test, mae, smape, mase)``.
    """
    b = (F.floor(F.unix_timestamp(F.col(ts_col).cast("timestamp"))
                 / F.lit(int(bucket_s)))).alias("__b")
    series = (df.where(F.col(ts_col).isNotNull()
                       & F.col(value_col).isNotNull())
              .groupBy(b)
              .agg(F.sum(F.col(value_col).cast("decimal(28,8)"))
                   .alias("__v")))
    w = Window.orderBy("__b")
    lagged = series.select(
        "__b", "__v",
        F.lag("__v", season).over(w).alias("__pred"),
        (F.row_number().over(w)
         > (F.count(F.lit(1)).over(
             Window.rowsBetween(Window.unboundedPreceding,
                                Window.unboundedFollowing))
            - F.lit(int(holdout)))).alias("__is_test"))
    # per-row stats accumulate as DECIMAL (order-independent exact
    # sums — the repo-wide moment discipline): the absolute error is
    # an exact decimal difference; the per-row sMAPE term is one
    # deterministic double expression quantized to 8 dp before the sum
    v = F.col("__v").cast("double")
    p = F.col("__pred").cast("double")
    err_dec = F.abs(F.col("__v") - F.col("__pred"))
    errd = F.abs(v - p)
    sm = F.round(F.when(F.abs(v) + F.abs(p) > 0,
                        F.lit(2.0) * errd / (F.abs(v) + F.abs(p)))
                 + F.lit(1e-12), 8).cast("decimal(18,8)")
    test = F.col("__is_test") & F.col("__pred").isNotNull()
    train = (~F.col("__is_test")) & F.col("__pred").isNotNull()
    agg = lagged.agg(
        F.count_if(train).alias("__ntr"),
        F.count_if(test).alias("__nte"),
        F.sum(F.when(test, err_dec)).alias("__se"),
        F.sum(F.when(test, sm)).alias("__ss"),
        F.sum(F.when(train, err_dec)).alias("__st"))
    nte = F.col("__nte").cast("double")
    ntr = F.col("__ntr").cast("double")
    mae = F.when(F.col("__nte") > 0,
                 F.col("__se").cast("double") / nte)
    scale = F.when(F.col("__ntr") > 0,
                   F.col("__st").cast("double") / ntr)
    return agg.select(
        F.col("__ntr").cast("bigint").alias("n_train"),
        F.col("__nte").cast("bigint").alias("n_test"),
        mae.cast("double").alias("mae"),
        F.when(F.col("__nte") > 0,
               F.col("__ss").cast("double") / nte).cast("double")
        .alias("smape"),
        F.when(scale > 0, mae / scale).cast("double").alias("mase"))


def conformal_seasonal(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    bucket_s: int = 3600,
    period_s: int = 86400,
    horizon: int = 24,
    alpha: float = 0.1,
    train_frac: float = 0.8,
) -> DataFrame:
    """Split-conformal prediction intervals around the seasonal-naive
    forecast (Vovk et al.'s split conformal; Lei et al. 2018's
    distribution-free form): fit the per-(key, slot) means on the FIRST
    ``train_frac`` of the global bucket range, score absolute residuals
    on the held-out calibration tail, and take each key's
    ``⌈(n+1)(1−α)⌉``-th smallest residual — an ORDER STATISTIC, never an
    interpolated quantile (interpolation is the one cross-engine
    percentile hazard; the conformal literature's own definition is the
    order statistic) — as the half-width of a ``1−α`` coverage interval
    on exchangeable future buckets.

    Plan shape: the corpus collapses in the same ONE map-side-combined
    (key, bucket) aggregate as :func:`seasonal_forecast`; the global
    train/calibration cutoff is a broadcast 1-row min/max frame (no
    collect); slot-mean frames are group-sized and broadcast back; the
    per-key residual rank is one window over the bucket-bounded
    calibration frame. Keys with zero calibration buckets have no
    conformal evidence and produce no row (the SQL no-evidence answer);
    a calibration key never seen in train falls back to the global slot
    mean, exactly like the forecast itself.

    Output: keys + (bucket_start, slot, forecast, lo, hi, n_cal,
    from_fallback) for the ``horizon`` buckets after the global last
    bucket, ``lo/hi = forecast ∓ q_key``.
    """
    if period_s % bucket_s != 0:
        raise ValueError("conformal_seasonal: period_s must be a "
                         "multiple of bucket_s")
    if not 0.0 < alpha < 1.0:
        raise ValueError("conformal_seasonal: alpha must be in (0, 1)")
    if not 0.0 < train_frac < 1.0:
        raise ValueError("conformal_seasonal: train_frac must be in "
                         "(0, 1)")
    from pyspark.sql import Window
    from ._join import broadcast_attach
    slots = period_s // bucket_s
    keys = list(key_cols)
    b = F.floor(F.unix_timestamp(F.col(ts_col).cast("timestamp"))
                / F.lit(int(bucket_s)))
    base = df.select(*keys, b.alias("__b"),
                     F.col(value_col).cast("decimal(18,6)").alias("__v"))
    per_bucket = (base.groupBy(*keys, "__b")
                  .agg(F.sum("__v").alias("__s"),
                       F.count("__v").alias("__n")))
    # the (key, bucket) frame fans out to 5 consumers (bounds, two
    # slot-mean fits, the calibration scan, the grid) — persist it once
    # (bucket-count-sized: |keys| × time-range/bucket, never raw rows);
    # released via the attach_intermediates contract
    per_bucket = per_bucket.persist()
    bounds = per_bucket.agg(F.min("__b").alias("__minb"),
                            F.max("__b").alias("__maxb"))
    pb = per_bucket.crossJoin(F.broadcast(bounds))
    cut = (F.col("__minb")
           + F.floor(F.lit(float(train_frac))
                     * (F.col("__maxb") - F.col("__minb")))).cast("long")
    pb = pb.withColumn("__cut", cut)
    slot_col = F.pmod(F.col("__b"), F.lit(int(slots)))
    train = pb.where(F.col("__b") <= F.col("__cut"))
    cal = pb.where(F.col("__b") > F.col("__cut"))
    key_slot = (train.groupBy(*keys, slot_col.alias("slot"))
                .agg((F.sum("__s").cast("double") / F.sum("__n"))
                     .alias("__km")))
    global_slot = (train.groupBy(slot_col.alias("slot"))
                   .agg((F.sum("__s").cast("double") / F.sum("__n"))
                        .alias("__gm")))
    calj = broadcast_attach(
        broadcast_attach(cal.withColumn("slot", slot_col),
                         key_slot, keys + ["slot"], "left"),
        global_slot, ["slot"], "left")
    yhat = F.coalesce(F.col("__km"), F.col("__gm"))
    r = F.abs(F.col("__s").cast("double") / F.col("__n") - yhat)
    resid = (calj.select(*keys, r.alias("__r"))
             .where(F.col("__r").isNotNull()))
    w = Window.partitionBy(*keys)
    ranked = resid.select(
        *keys, "__r",
        F.row_number().over(w.orderBy(F.col("__r").asc())).alias("__rn"),
        F.count("*").over(w).alias("__nc"))
    kth = F.least(
        F.ceil((F.col("__nc") + 1) * F.lit(1.0 - float(alpha))),
        F.col("__nc"))
    qf = (ranked.where(F.col("__rn") == kth)
          .select(*keys, F.col("__nc").cast("bigint").alias("n_cal"),
                  F.col("__r").alias("__q")))
    grid = (qf.crossJoin(F.broadcast(bounds))
            .select(*keys, "n_cal", "__q",
                    F.explode(F.sequence(
                        F.col("__maxb") + 1,
                        F.col("__maxb") + int(horizon))).alias("__fb")))
    grid = grid.withColumn("slot", F.pmod(F.col("__fb"),
                                          F.lit(int(slots))))
    out = broadcast_attach(
        broadcast_attach(grid, key_slot, keys + ["slot"], "left"),
        global_slot, ["slot"], "left")
    fc = F.coalesce(F.col("__km"), F.col("__gm"))
    from ._cache import attach_intermediates
    return attach_intermediates(out.select(
        *keys,
        F.timestamp_seconds(F.col("__fb") * int(bucket_s))
        .alias("bucket_start"),
        F.col("slot").cast("bigint").alias("slot"),
        fc.alias("forecast"),
        (fc - F.col("__q")).alias("lo"),
        (fc + F.col("__q")).alias("hi"),
        "n_cal",
        F.col("__km").isNull().alias("from_fallback")), [per_bucket])
