"""Event sessionization — gap-based session assignment and per-session
aggregates over an event stream table.

Extends the reference surface (Azure/Feathr has no sessionization; its
event-time machinery stops at windowed aggregation, source.rs:266-271) —
sessions are the standard unit for behavioral features and for grouping
interaction logs into training examples.

Scale shape: ONE shuffle on the entity key (the window partition);
everything else is narrow. Session boundaries are a per-key linear scan
(lag + running sum inside the sorted partition — no self-join, no
iteration), so the plan is a single Exchange + Sort + two Window
operators regardless of event count. Skewed users produce large
partitions; at 100 TB cap sessions per user upstream or bucket the event
table by user so the sort is co-located.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..model import parse_duration_ms


def sessionize(df: DataFrame, user_col: str = "user_id",
               ts_col: str = "ts", gap: str = "30m",
               order_cols: Optional[Sequence[str]] = None) -> DataFrame:
    """Assign a per-user 1-based ``session_seq`` to every event.

    A new session starts at a user's first event and whenever the time
    since the previous event exceeds ``gap`` (HOCON-style duration, bare
    number = ms — reference utils.rs:62-94 semantics). ``order_cols``
    breaks timestamp ties deterministically (default: the timestamp
    only). NULL timestamps sort first and join the user's first session.
    """
    gap_ms = parse_duration_ms(gap)
    ts_ms = F.unix_millis(F.col(ts_col).cast("timestamp"))
    order = [ts_ms.asc()] + [F.col(c).asc() for c in (order_cols or ())]
    w = Window.partitionBy(user_col).orderBy(*order)
    prev = F.lag(ts_ms).over(w)
    new_session = (prev.isNull() | (ts_ms - prev > gap_ms)).cast("bigint")
    # running sum over the SAME window spec: reuses the one sort
    seq = F.sum(new_session).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return df.withColumn("session_seq", seq)


def session_stats(df: DataFrame, user_col: str = "user_id",
                  ts_col: str = "ts", gap: str = "30m",
                  value_col: Optional[str] = None,
                  order_cols: Optional[Sequence[str]] = None) -> DataFrame:
    """Per-session aggregates: event count, start/end epoch-ms, duration.

    Output: (user, session_seq, n_events, start_ms, end_ms, duration_sec
    [, sum_<value_col>]). The groupBy hash-partitions on
    (user, session_seq) — a superset of the sessionize window's
    partitioning, so partial aggregation compresses map-side and no row
    leaves its session's partition unaggregated.
    """
    ts_ms = F.unix_millis(F.col(ts_col).cast("timestamp"))
    sess = sessionize(df, user_col, ts_col, gap, order_cols) \
        .withColumn("__ms", ts_ms)
    aggs = [
        F.count("*").cast("bigint").alias("n_events"),
        F.min("__ms").alias("start_ms"),
        F.max("__ms").alias("end_ms"),
        ((F.max("__ms") - F.min("__ms")) / 1000.0).alias("duration_sec"),
    ]
    if value_col is not None:
        aggs.append(F.round(F.sum(value_col), 4).cast("double")
                    .alias(f"sum_{value_col}"))
    return sess.groupBy(user_col, "session_seq").agg(*aggs)


def transition_matrix(df: DataFrame, user_col: str = "user_id",
                      ts_col: str = "ts", event_col: str = "event_type",
                      order_cols: Optional[Sequence[str]] = None
                      ) -> DataFrame:
    """First-order Markov transition matrix over each user's event
    sequence: counts and row-normalized probabilities of ``from_event →
    to_event`` for CONSECUTIVE events (the path-analysis companion to the
    funnel operator — funnels test one ordered hypothesis, the transition
    matrix surfaces all of them).

    One shuffle on the user key (the lag window); the transition pairs
    then aggregate with map-side partials into an |event types|² frame,
    and the probability normalization joins that tiny frame against its
    own row sums (broadcast). Ties in event time are broken by
    ``order_cols`` (default: the event column) so the sequence — and
    therefore the matrix — is deterministic under any partitioning.

    Output: (from_event, to_event, n, prob) with prob = n / Σ_to n.
    """
    order = [F.col(ts_col).asc()] + \
        [F.col(c).asc() for c in (order_cols or [event_col])]
    w = Window.partitionBy(user_col).orderBy(*order)
    steps = (df.where(F.col(ts_col).isNotNull() &
                      F.col(user_col).isNotNull())
             .withColumn("__next", F.lead(F.col(event_col)).over(w))
             .where(F.col("__next").isNotNull()))
    counts = (steps.groupBy(F.col(event_col).alias("from_event"),
                            F.col("__next").alias("to_event"))
              .agg(F.count("*").cast("bigint").alias("n")))
    totals = counts.groupBy("from_event") \
        .agg(F.sum("n").alias("__tot"))
    return (counts.join(F.broadcast(totals), "from_event")
            .select("from_event", "to_event", "n",
                    (F.col("n") / F.col("__tot")).alias("prob")))


def top_paths(
    df: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tie_col: str = None,
    n: int = 2,
    k: int = 20,
    sep: str = ">",
) -> DataFrame:
    """Most common length-``n`` event-type paths (consecutive sequences
    within one user's timeline) — the "what do users do next" readout
    behind funnel discovery and next-event features.

    Plan: ONE shuffle collects each user's ordered type list
    (``array_sort`` over (ts, tie, type) structs — deterministic under
    timestamp ties; sorting inside the aggregated array, never a
    window); path extraction is a row-local ``transform`` over index
    ``sequence``; the path counts are a second, path-cardinality-bounded
    aggregate; the global top-k compiles to TakeOrderedAndProject
    (per-partition k, never a full sort). Users shorter than ``n``
    contribute nothing.

    Output: (path, n_occurrences), ties broken lexicographically.
    """
    order_cols = [F.col(ts_col).cast("timestamp").alias("__t")] + \
        ([F.col(tie_col).alias("__tie")] if tie_col else []) + \
        [F.col(type_col).alias("__y")]
    seq = (df.where(F.col(type_col).isNotNull())
           .groupBy(user_col)
           .agg(F.array_sort(F.collect_list(F.struct(*order_cols)))
                .alias("__evs")))
    tl = seq.select(F.transform("__evs", lambda s: s["__y"]).alias("__tl"))
    paths = tl.select(F.explode(F.when(
        F.size("__tl") >= n,
        F.transform(F.sequence(F.lit(1), F.size("__tl") - n + 1),
                    lambda i: F.concat_ws(sep, F.slice("__tl", i, n)))
    )).alias("path"))
    return (paths.groupBy("path").agg(F.count("*").alias("n_occurrences"))
            .orderBy(F.col("n_occurrences").desc(), F.col("path").asc())
            .limit(k))


def interarrival_stats(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    tie_col: str = None,
    unit_seconds: int = 86400,
) -> DataFrame:
    """Per-entity inter-arrival gap profile: for each key with ≥ 2
    events, the count, mean, min and max of consecutive gaps (in
    ``unit_seconds`` units — days by default), plus the span between
    first and last event. The purchase-cadence / heartbeat-regularity
    readout behind churn features and re-engagement triggers.

    Plan: ONE window partitioned by the key (scale-safe — never a
    global sort; ``tie_col`` breaks equal timestamps deterministically)
    computes each row's lag, then ONE aggregate collapses to the key.
    Gaps are exact integer second differences scaled in DOUBLE at the
    end, so means are order-stable at any parallelism (integer-sum /
    count).
    """
    order = [F.col(ts_col).cast("timestamp")]
    if tie_col is not None:
        order.append(F.col(tie_col))
    w = Window.partitionBy(key_col).orderBy(*order)
    secs = F.unix_timestamp(F.col(ts_col).cast("timestamp"))
    gap = secs - F.lag(secs).over(w)
    g = (df.where(F.col(ts_col).isNotNull())
         .select(F.col(key_col), gap.alias("__gap")))
    out = (g.groupBy(key_col)
           .agg(F.count(F.lit(1)).alias("__n"),
                F.count("__gap").alias("__ng"),
                F.sum("__gap").alias("__sg"),
                F.min("__gap").alias("__mn"),
                F.max("__gap").alias("__mx"))
           .where(F.col("__ng") >= 1))
    u = F.lit(float(unit_seconds))
    return out.select(
        F.col(key_col),
        F.col("__n").cast("bigint").alias("n_events"),
        (F.col("__sg").cast("double") / u).alias("span"),
        (F.col("__sg").cast("double")
         / F.col("__ng").cast("double") / u).alias("avg_gap"),
        (F.col("__mn").cast("double") / u).alias("min_gap"),
        (F.col("__mx").cast("double") / u).alias("max_gap"))


def fano_factor(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    bucket_s: int = 3600,
) -> DataFrame:
    """Per-entity burstiness of event arrivals: the Fano factor
    (variance-to-mean ratio of per-bucket event counts over the
    entity's OWN active span, empty buckets included) — ≈1 for a
    Poisson process, >1 bursty, <1 metronomic. The behavioral-rhythm
    feature behind bot and anomaly detection.

    Exact integer algebra: per (entity, bucket) counts collapse once
    (the only data-sized shuffle), then per entity Σc, Σc², the
    non-empty bucket count and the span (max−min+1 buckets) fold in a
    second aggregate; zero buckets enter the population variance via
    the span term — never materialized. μ = Σc/span, population
    Var = Σc²/span − μ²; both derived in double from exact integer
    sums, so results are bit-stable at any parallelism. Entities whose
    span is a single bucket get NULL fano (zero-variance-undefined).

    Output: ``(key, n_events, span_buckets, active_buckets,
    mean_per_bucket, fano)``.
    """
    b = F.floor(F.unix_timestamp(F.col(ts_col).cast("timestamp"))
                / F.lit(int(bucket_s)))
    per = (df.where(F.col(ts_col).isNotNull())
           .groupBy(F.col(key_col), b.alias("__b"))
           .agg(F.count(F.lit(1)).alias("__c")))
    agg = (per.groupBy(key_col)
           .agg(F.sum("__c").alias("__n"),
                F.sum(F.col("__c") * F.col("__c")).alias("__cc"),
                F.count(F.lit(1)).alias("__nb"),
                (F.max("__b") - F.min("__b") + 1).alias("__span")))
    n = F.col("__n").cast("double")
    cc = F.col("__cc").cast("double")
    span = F.col("__span").cast("double")
    mu = n / span
    var = cc / span - mu * mu
    return agg.select(
        F.col(key_col),
        F.col("__n").cast("bigint").alias("n_events"),
        F.col("__span").cast("bigint").alias("span_buckets"),
        F.col("__nb").cast("bigint").alias("active_buckets"),
        mu.cast("double").alias("mean_per_bucket"),
        F.when((F.col("__span") > 1) & (mu > 0), var / mu)
        .cast("double").alias("fano"))


def peak_concurrency(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30m",
) -> DataFrame:
    """Daily peak concurrent sessions: sessionize per user (gap rule),
    sweep +1/−1 over session start/end instants, and report each day's
    maximum simultaneous session count — the capacity-planning readout
    (licensing, serving-fleet sizing, abuse spikes).

    Scale shape: the sweep is NEVER a global sort. Boundary points
    cumsum inside a per-DAY window (partitioned — bounded by a day's
    sessions), and sessions straddling midnight are handled exactly by
    a cross-day carry: per-day delta totals fold over the day-count-
    sized frame (the bucketed-prefix pattern), so day d's running
    count starts from the true number of sessions still open at its
    midnight. Tie order at one instant is (+1 before −1, then user,
    then session) — touching sessions count as concurrent and the
    sweep is deterministic under any partitioning.

    Output: (day, n_sessions_started, peak_concurrency) — for OBSERVED
    days only: a day appears iff at least one session boundary (start
    or end) falls on it. A day fully inside a multi-day session (no
    boundary events that day) is absent even though true concurrency is
    positive all day; with a 30m-style gap rule such days cannot occur,
    and gap-free callers that need them should gap-fill downstream from
    the previous day's carry rather than pay a calendar join here.
    """
    # tie order among equal timestamps cannot change session bounds
    # (a 0 gap never exceeds the gap rule), so the default ordering is
    # already deterministic in outcome
    sess = session_stats(df, user_col, ts_col, gap)
    pts = (sess.select(F.col(user_col).alias("__u"), "session_seq",
                       F.col("start_ms").alias("__t"),
                       F.lit(1).alias("__d"))
           .unionByName(
               sess.select(F.col(user_col).alias("__u"), "session_seq",
                           F.col("end_ms").alias("__t"),
                           F.lit(-1).alias("__d"))))
    day = F.to_date(F.timestamp_millis(F.col("__t")))
    pts = pts.select(day.alias("__day"), "__t", "__d", "__u",
                     "session_seq").persist()
    w = (Window.partitionBy("__day")
         .orderBy(F.col("__t").asc(), F.col("__d").desc(),
                  F.col("__u").asc(), F.col("session_seq").asc())
         .rowsBetween(Window.unboundedPreceding, 0))
    local = pts.withColumn("__run", F.sum("__d").over(w))
    day_tot = (pts.groupBy("__day")
               .agg(F.sum("__d").alias("__dt"),
                    F.sum(F.when(F.col("__d") == 1, 1).otherwise(0))
                    .alias("__ns")))
    wday = (Window.orderBy("__day")
            .rowsBetween(Window.unboundedPreceding, -1))
    carry = day_tot.select(
        "__day", "__ns",
        F.coalesce(F.sum("__dt").over(wday), F.lit(0)).alias("__carry"))
    out = (local.groupBy("__day")
           .agg(F.max("__run").alias("__peak_local"))
           .join(F.broadcast(carry), "__day"))
    res = out.select(
        F.date_format("__day", "yyyy-MM-dd").alias("day"),
        F.col("__ns").cast("bigint").alias("n_sessions_started"),
        (F.col("__peak_local") + F.col("__carry")).cast("bigint")
        .alias("peak_concurrency"))
    from ._cache import attach_intermediates
    return attach_intermediates(res, (pts,))
