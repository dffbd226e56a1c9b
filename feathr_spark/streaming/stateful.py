"""Custom stateful streaming operator: per-key latest feature view.

The reference's online store is a Redis table of the latest feature values
per entity key, refreshed by streaming jobs (materialization.rs:28-55).
This operator maintains that view *inside* Structured Streaming with
``applyInPandasWithState`` — per entity key, keep the event-time-latest
value of each feature column and emit a row only when the state changes.
Downstream, any sink (memory/redis/kafka) receives an upsert stream.

Scale design: state is per-key (a few doubles), partitioned by the
grouping key across executors; batches arrive Arrow-encoded; no state ever
reaches the driver.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType,
)


def stream_latest_features(
    stream_df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_cols: Sequence[str],
    watermark: str = "10 minutes",
) -> DataFrame:
    """Upsert stream of the per-key latest feature values.

    Output schema: key columns (as strings), ``ts_ms`` (event time of the
    winning row) and one double column per value column. A row is emitted
    for a key only in micro-batches where a newer event won (late rows
    older than the current state are ignored — LATEST semantics,
    model.rs:214).
    """
    keys = list(keys)
    value_cols = list(value_cols)

    out_schema = StructType(
        [StructField(k, StringType()) for k in keys]
        + [StructField("ts_ms", LongType())]
        + [StructField(v, DoubleType()) for v in value_cols]
    )
    state_schema = StructType(
        [StructField("ts_ms", LongType())]
        + [StructField(v, DoubleType()) for v in value_cols]
    )

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        best_ts = state.get[0] if state.exists else None
        best_vals = list(state.get[1:]) if state.exists else [None] * len(value_cols)
        changed = False
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            i = pdf["__ts_ms"].idxmax()
            ts = int(pdf["__ts_ms"].loc[i])
            if best_ts is None or ts > best_ts:
                best_ts = ts
                best_vals = [None if pd.isna(pdf[v].loc[i]) else float(pdf[v].loc[i])
                             for v in value_cols]
                changed = True
        if changed:
            state.update((best_ts, *best_vals))
            yield pd.DataFrame(
                [[*(str(k) for k in key), best_ts, *best_vals]],
                columns=[*keys, "ts_ms", *value_cols])

    prepared = (stream_df
                .withWatermark(ts_col, watermark)
                .withColumn("__ts_ms", F.unix_millis(F.col(ts_col).cast("timestamp")))
                .select(*keys, "__ts_ms",
                        *[F.col(v).cast("double").alias(v) for v in value_cols]))
    return prepared.groupBy(*keys).applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout)


def stream_decay_counters(
    stream_df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    half_life_days: float,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Per-key exponentially time-decayed counter — the ONLINE
    counterpart of the batch ``DECAY_SUM`` aggregation: after each
    micro-batch a key's state holds ``sum(v_i * 0.5**((t_ref - t_i) /
    half_life))`` over its whole event history, rescaled to the newest
    event time seen (``t_ref``).

    The decayed sum is mergeable by rescaling: carrying state ``(s, t)``
    forward to a newer reference ``t'`` is ``s * 0.5**((t' - t)/h)`` —
    so each micro-batch folds into constant per-key state (two numbers),
    the property that makes decayed counters the canonical streaming
    fraud/abuse feature. Late rows (event time before the current
    reference) still fold in exactly: their weight at the existing
    reference is ``0.5**((t_ref - t_i)/h)`` — no reordering needed,
    because the decayed sum is order-independent by construction.

    Emits one row per key per micro-batch in which the key saw events:
    key columns (as strings), ``ts_ms`` (reference time) and
    ``decayed_sum``. Identical to batch DECAY_SUM over the same events
    at the same reference instant (value-tested).
    """
    keys = list(keys)
    half_ms = float(half_life_days) * 86400000.0

    out_schema = StructType(
        [StructField(k, StringType()) for k in keys]
        + [StructField("ts_ms", LongType()),
           StructField("decayed_sum", DoubleType())]
    )
    state_schema = StructType(
        [StructField("ts_ms", LongType()),
         StructField("decayed_sum", DoubleType())]
    )

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        ref, s = (state.get if state.exists else (None, 0.0))
        saw = False
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            saw = True
            batch_max = int(pdf["__ts_ms"].max())
            if ref is None:
                ref = batch_max
            elif batch_max > ref:
                s *= 0.5 ** ((batch_max - ref) / half_ms)
                ref = batch_max
            w = 0.5 ** ((ref - pdf["__ts_ms"].astype("int64")) / half_ms)
            s += float((pdf["__v"].astype("float64") * w).sum())
        if saw:
            state.update((ref, s))
            yield pd.DataFrame(
                [[*(str(k) for k in key), ref, s]],
                columns=[*keys, "ts_ms", "decayed_sum"])

    prepared = (stream_df
                .withWatermark(ts_col, watermark)
                .withColumn("__ts_ms",
                            F.unix_millis(F.col(ts_col).cast("timestamp")))
                .select(*keys, "__ts_ms",
                        F.col(value_col).cast("double").alias("__v"))
                .where(F.col("__ts_ms").isNotNull() &
                       F.col("__v").isNotNull()))
    return prepared.groupBy(*keys).applyInPandasWithState(
        update, out_schema, state_schema, "update",
        GroupStateTimeout.NoTimeout)
