"""Event funnel analysis: ordered multi-step conversion counting.

"How many users did view → click → purchase, in that order?" — the
standard product-analytics funnel, computed distributed:

1. filter to the funnel's event types (pushed into the scan),
2. ONE ``groupBy(user)`` collecting the (ts, step-index) pairs,
3. a sorted higher-order-function fold walks each user's sequence once,
   greedily matching the next needed step (greedy earliest-match is
   exact for subsequence containment: taking the earliest occurrence of
   a step never prevents completing the rest),
4. a single-row aggregate counts users reaching each depth.

The per-user payload is a handful of (timestamp, byte) structs — the
shuffle carries no raw events — and the fold is row-local. An optional
``within`` duration bounds the whole funnel to a time window starting at
the matched first step (the funnel state carries that anchor).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def retention_cohorts(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_days: int = 30,
) -> DataFrame:
    """Classic cohort retention matrix: users are cohorted by their FIRST
    active day; ``retained`` counts how many of a cohort were active
    again exactly N days later (0 ≤ N ≤ ``max_days``).

    Plan shape: one ``groupBy(user)`` finds each user's cohort day (a
    min — map-side combined); distinct (user, day) activity joins the
    tiny cohort frame back on the user id (AQE broadcasts it when small,
    plain equi-join at scale); the final count groups the (cohort, offset)
    pairs. Day 0 equals the cohort size by construction, so the output
    doubles as the cohort-size row.

    Output: (cohort_day date, day_offset, retained).
    """
    day = F.to_date(F.col(ts_col))
    active = (df.where(F.col(ts_col).isNotNull()
                       & F.col(user_col).isNotNull())
              .select(F.col(user_col).alias("__u"), day.alias("__d"))
              .distinct())
    cohort = active.groupBy("__u").agg(F.min("__d").alias("__cd"))
    return (active.join(cohort, "__u")
            .withColumn("__off", F.datediff(F.col("__d"), F.col("__cd")))
            .where(F.col("__off") <= max_days)
            .groupBy(F.col("__cd").alias("cohort_day"),
                     F.col("__off").cast("bigint").alias("day_offset"))
            .agg(F.countDistinct("__u").cast("bigint").alias("retained")))


def ltv_cohorts(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    amount_col: str = "amount",
    max_offset: int = 12,
) -> DataFrame:
    """Cohort lifetime-value triangle: users are cohorted by their FIRST
    active month; each (cohort, month-offset) cell sums that cohort's
    revenue in that month, plus the running cumulative per-user LTV.

    Plan shape mirrors ``retention_cohorts``: one ``groupBy(user)`` min
    finds the cohort month (map-side combined), the user-sized cohort
    frame joins back on the user id (AQE-broadcast when small), one
    (cohort, offset) aggregate, then window cumsums over the tiny
    triangle frame. Revenue folds as DECIMAL (order-independent exact
    sum — see the portability note in BASELINE.md) and converts to
    double only for the per-user readout.

    Output: (cohort_month date, month_offset, cohort_users, revenue,
    cum_ltv_per_user).
    """
    mon = F.trunc(F.col(ts_col).cast("date"), "month")
    base = (df.where(F.col(ts_col).isNotNull()
                     & F.col(user_col).isNotNull())
            .select(F.col(user_col).alias("__u"), mon.alias("__m"),
                    F.col(amount_col).cast("decimal(28,8)").alias("__amt"))
            .persist())  # consumed by the cohort agg AND the join back
    cohort = base.groupBy("__u").agg(F.min("__m").alias("__cm"))
    cells = (base.join(cohort, "__u")
             .withColumn("__off", F.months_between(F.col("__m"),
                                                   F.col("__cm"))
                         .cast("bigint"))
             .where(F.col("__off") <= max_offset)
             .groupBy(F.col("__cm").alias("cohort_month"),
                      F.col("__off").alias("month_offset"))
             .agg(F.countDistinct("__u").alias("__users"),
                  F.sum("__amt").alias("__rev")))
    from pyspark.sql import Window
    wc = (Window.partitionBy("cohort_month").orderBy("month_offset")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    size = F.first(F.when(F.col("month_offset") == 0, F.col("__users"))
                   .otherwise(None), ignorenulls=True).over(
        Window.partitionBy("cohort_month"))
    out = (cells
           .withColumn("cohort_users", size.cast("bigint"))
           .select("cohort_month",
                   F.col("month_offset").cast("bigint")
                   .alias("month_offset"),
                   "cohort_users",
                   F.col("__rev").cast("double").alias("revenue"),
                   (F.sum(F.col("__rev").cast("double")).over(wc)
                    / F.col("cohort_users")).alias("cum_ltv_per_user")))
    from ._cache import attach_intermediates
    return attach_intermediates(out, [base])


def funnel_counts(
    df: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within: Optional[str] = None,
) -> DataFrame:
    """Count users completing each prefix of ``steps`` in strict
    timestamp order (later steps must be strictly after earlier ones;
    the first step anchors the optional ``within`` window — a HOCON
    duration like ``"2h"``).

    Output: (step, step_type, n_users), step 1-based, one row per step;
    ``n_users`` is non-increasing down the funnel.

    Semantics note: matching is GREEDY-EARLIEST — each step matches its
    earliest admissible occurrence, and ``within`` anchors at the
    earliest first-step event. Without ``within`` greedy subsequence
    matching is exact; with it, a user whose only qualifying chain
    starts at a LATER first-step occurrence is not counted (deterministic
    one-pass semantics, same family as ClickHouse's windowFunnel; exact
    any-anchor matching needs per-anchor re-scans).
    """
    steps = list(steps)
    if not steps or len(set(steps)) != len(steps):
        raise ValueError("steps must be non-empty and distinct")
    idx = F.create_map(*[x for i, s in enumerate(steps)
                         for x in (F.lit(s), F.lit(i))])
    evs = (df
           .where(F.col(type_col).isin(steps)
                  & F.col(ts_col).isNotNull()
                  & F.col(user_col).isNotNull())
           .select(F.col(user_col).alias("__u"),
                   F.struct(F.col(ts_col).alias("ts"),
                            idx[F.col(type_col)].alias("idx"))
                   .alias("__e")))
    per_user = evs.groupBy("__u").agg(
        F.sort_array(F.collect_list("__e")).alias("__seq"))

    n_steps = len(steps)
    if within is not None:
        from ..model import parse_duration_ms
        tol_ms = F.lit(parse_duration_ms(within))

    def step_fold(acc, x):
        ts_ms = F.unix_millis(x.ts.cast("timestamp"))
        ok = (acc.n < n_steps) & (x.idx == acc.n) \
            & ((acc.n == 0) | (ts_ms > acc.last))
        if within is not None:
            ok = ok & ((acc.n == 0) | (ts_ms - acc.t0 <= tol_ms))
        return F.when(ok, F.struct(
            (acc.n + 1).alias("n"),
            ts_ms.alias("last"),
            F.when(acc.n == 0, ts_ms).otherwise(acc.t0).alias("t0"),
        )).otherwise(acc)

    zero = F.struct(F.lit(0).alias("n"),
                    F.lit(None).cast("bigint").alias("last"),
                    F.lit(None).cast("bigint").alias("t0"))
    reached = per_user.select(
        F.aggregate("__seq", zero, step_fold).getField("n").alias("__r"))
    counts = reached.agg(*[
        F.count_if(F.col("__r") >= i + 1).cast("bigint")
        .alias(f"__c{i}") for i in range(n_steps)])
    rows = [F.struct(F.lit(i + 1).cast("bigint").alias("step"),
                     F.lit(s).alias("step_type"),
                     F.col(f"__c{i}").alias("n_users"))
            for i, s in enumerate(steps)]
    return (counts
            .select(F.explode(F.array(*rows)).alias("__row"))
            .select("__row.step", "__row.step_type", "__row.n_users"))


def funnel_latency(
    df: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    step_a: str,
    step_b: str,
    percentile_mode: str = "buffer",
) -> DataFrame:
    """Time-to-convert between two funnel steps: for each entity whose
    first ``step_a`` event is followed (at or after it) by a
    ``step_b`` event, the latency from that first A to the first
    subsequent B — summarized as conversion counts and exact latency
    percentiles (p50/p90) plus the mean, in hours.

    Plan: one conditional aggregate collapses each entity to its first
    A timestamp; the B events join that ENTITY-sized frame co-keyed
    and fold to the first-B-after-A per entity; the final summary is a
    1-row exact-percentile aggregate over the entity-sized latency
    frame. Latencies are exact integer second differences; the mean
    accumulates the integer sum (order-independent), percentiles are
    PERCENTILE_CONT over the entity frame.

    ``percentile_mode``: ``"buffer"`` (default) folds the percentiles
    in the same 1-row aggregate — exact, but its partial state is the
    full latency multiset merged in ONE task (fine to ~10^7 converted
    entities). ``"selection"`` routes them through
    :func:`feathr_spark.operators.stats.selection_percentiles`
    (bucket-histogram distributed selection, bit-identical values) so
    no task ever holds the multiset — the extreme-scale path, at the
    cost of two extra bounded-collect passes over the latency frame.

    Output (1 row): ``(n_started, n_converted, conv_rate, mean_hours,
    p50_hours, p90_hours)``.
    """
    if percentile_mode not in ("buffer", "selection"):
        raise ValueError(f"funnel_latency: unknown percentile_mode "
                         f"{percentile_mode!r}")
    secs = F.unix_timestamp(F.col(ts_col).cast("timestamp"))
    # persisted: the B-side conversion join and the final left join
    # both read the first-A frame
    first_a = (df.where(F.col(type_col) == step_a)
               .groupBy(F.col(user_col).alias("__u"))
               .agg(F.min(secs).alias("__ta"))
               .persist())
    b_events = (df.where(F.col(type_col) == step_b)
                .select(F.col(user_col).alias("__u"), secs.alias("__tb")))
    conv = (b_events.join(first_a, "__u")
            .where(F.col("__tb") >= F.col("__ta"))
            .groupBy("__u")
            .agg((F.min("__tb") - F.min("__ta")).alias("__lat")))
    extra = ()
    if percentile_mode == "selection":
        from .stats import selection_percentiles
        conv = conv.persist()   # selection passes + the stats fold
        extra = (conv,)
        p50, p90 = selection_percentiles(conv, "__lat", [0.5, 0.9])
        stats = (first_a.join(conv, "__u", "left")
                 .agg(F.count(F.lit(1)).alias("__ns"),
                      F.count("__lat").alias("__nc"),
                      F.sum("__lat").alias("__sl"))
                 .select("*",
                         F.lit(p50).cast("double").alias("__p50"),
                         F.lit(p90).cast("double").alias("__p90")))
    else:
        stats = (first_a.join(conv, "__u", "left")
                 .agg(F.count(F.lit(1)).alias("__ns"),
                      F.count("__lat").alias("__nc"),
                      F.sum("__lat").alias("__sl"),
                      F.percentile(F.col("__lat"), F.lit(0.5))
                      .alias("__p50"),
                      F.percentile(F.col("__lat"), F.lit(0.9))
                      .alias("__p90")))
    h = F.lit(3600.0)
    nc = F.col("__nc").cast("double")
    from feathr_spark.operators._cache import attach_intermediates
    return attach_intermediates(stats.select(
        F.col("__ns").cast("bigint").alias("n_started"),
        F.col("__nc").cast("bigint").alias("n_converted"),
        F.when(F.col("__ns") > 0,
               nc / F.col("__ns").cast("double")).cast("double")
        .alias("conv_rate"),
        F.when(F.col("__nc") > 0,
               F.col("__sl").cast("double") / nc / h).cast("double")
        .alias("mean_hours"),
        (F.col("__p50") / h).cast("double").alias("p50_hours"),
        (F.col("__p90") / h).cast("double").alias("p90_hours")),
        (first_a,) + extra)
