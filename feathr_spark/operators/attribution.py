"""Marketing-style conversion attribution over an event log.

"Which channels get credit for conversions?" under the three standard
position models — first-touch, last-touch, and linear (equal split
across a user's touches). Deterministic one-anchor semantics (same
family as ``funnel_counts``): each user's FIRST conversion event is
the anchor, and every qualifying touch strictly before it (optionally
within a lookback window) earns credit. Re-conversions are a separate
question (run on a sessionized or per-conversion-windowed frame).

Plan shape: anchors come from one ``groupBy(user)`` min over the
filtered conversion events; touches equi-join the anchor frame on the
user id (AQE broadcasts the anchor side when small — user-sized, far
smaller than the log); then TWO aggregates over the touch frame — a
(user, channel) count and a per-user first/last/total — joined
channel-wise into the final channel-sized result. No windows over the
raw log, no collects; the only data-sized shuffles are the two touch
aggregates, both map-side combined. Ties at equal timestamps break on
the id column so both engines agree.
"""
from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ._cache import attach_intermediates


def attribution_credits(
    df: DataFrame,
    conversion_type: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    lookback: Optional[str] = None,
    micro: Optional[int] = None,
) -> DataFrame:
    """Credit per channel (= non-conversion ``type_col`` value) under
    first-touch / last-touch / linear attribution, anchored at each
    user's first ``conversion_type`` event. ``lookback`` is a HOCON
    duration ("30d"): touches older than that before the anchor are
    ignored. Users with a conversion but no qualifying touch earn no
    credit anywhere (they had no attributable path).

    Output: (channel, n_touches, first_touch, last_touch, linear) —
    first/last are user counts, linear sums each user's fractional
    split; all three columns total the same number of attributed users.

    ``micro`` (e.g. 1_000_000) switches linear credit to integer
    micro-unit accounting: each (user, channel) contributes
    ``round(micro·cnt/total)`` units, summed as BIGINT and divided back
    once at readout. Floating-point sums are order-dependent, and
    aggregation order varies with partitioning — at 1000 executors two
    runs of the same query can disagree in the low bits. Integer sums
    are exact and order-independent, so the quantized mode is both
    reproducible across cluster layouts and engine-portable (the
    quantization error is bounded by touches/micro — irrelevant at any
    reporting precision).
    """
    # the engine-wide time convention is MILLISECOND granularity (see
    # the __spark_entry__ module docstring): every comparison and
    # ordering here goes through unix_millis so results don't depend on
    # the source's physical timestamp precision (parquet ns vs µs)
    t_ms = F.unix_millis(F.col(ts_col).cast("timestamp"))
    conv = (df.where((F.col(type_col) == conversion_type)
                     & F.col(ts_col).isNotNull()
                     & F.col(user_col).isNotNull())
            .groupBy(F.col(user_col).alias("__u"))
            .agg(F.min(t_ms).alias("__conv_ms")))
    cond = t_ms < F.col("__conv_ms")
    if lookback is not None:
        from ..model import parse_duration_ms
        ms = parse_duration_ms(lookback)
        cond = cond & (t_ms >= F.col("__conv_ms") - F.lit(ms))
    # deterministic ordering key for equal-timestamp touches
    okey = F.struct(t_ms.alias("ts"), F.col(id_col).alias("id"))
    touches = (df.where((F.col(type_col) != conversion_type)
                        & F.col(ts_col).isNotNull()
                        & F.col(user_col).isNotNull())
               .join(conv, F.col(user_col) == F.col("__u"))
               .where(cond)
               .select(F.col("__u"),
                       F.col(type_col).alias("channel"),
                       okey.alias("__k"))
               .persist())  # 2 aggregate consumers
    per_uc = touches.groupBy("__u", "channel") \
        .agg(F.count(F.lit(1)).alias("__cnt"))
    # user-sized, 3 consumers (linear join + first + last groupBys)
    per_u = touches.groupBy("__u").agg(
        F.min_by("channel", F.col("__k")).alias("__first"),
        F.max_by("channel", F.col("__k")).alias("__last"),
        F.count(F.lit(1)).alias("__tot")).persist()
    if micro is not None:
        units = F.round(F.lit(float(micro)) * F.col("__cnt")
                        / F.col("__tot")).cast("bigint")
        lin = (F.sum(units).cast("double") / F.lit(float(micro)))
    else:
        lin = F.sum(F.col("__cnt").cast("double") / F.col("__tot"))
    linear = (per_uc.join(per_u, "__u")
              .groupBy("channel")
              .agg(F.sum("__cnt").cast("bigint").alias("n_touches"),
                   lin.alias("linear")))
    first = per_u.groupBy(F.col("__first").alias("channel")) \
        .agg(F.count(F.lit(1)).alias("first_touch"))
    last = per_u.groupBy(F.col("__last").alias("channel")) \
        .agg(F.count(F.lit(1)).alias("last_touch"))
    out = (linear.join(first, "channel", "left")
           .join(last, "channel", "left")
           .select("channel", "n_touches",
                   F.coalesce(F.col("first_touch"), F.lit(0))
                   .cast("bigint").alias("first_touch"),
                   F.coalesce(F.col("last_touch"), F.lit(0))
                   .cast("bigint").alias("last_touch"),
                   F.col("linear")))
    return attach_intermediates(out, [touches, per_u])
