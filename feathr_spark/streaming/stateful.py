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
    ArrayType, DoubleType, LongType, StringType, StructField, StructType,
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


def stream_heavy_hitters(
    stream_df: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    window: str = "1h",
    watermark: str = "10 minutes",
    k: int = 10,
    capacity: int = 4096,
) -> DataFrame:
    """Streaming top-``k`` terms per tumbling window with BOUNDED state —
    the streaming face of :func:`..operators.sketch.heavy_hitters`: one
    Misra-Gries summary (``capacity`` counters, same decrement rule and
    error bound) per open window, merged incrementally as micro-batches
    arrive, emitted ONCE when the watermark closes the window
    (event-time timeout), then evicted.

    State per window is ``capacity`` (term, count) pairs regardless of
    how many events land in it — the unbounded-vocabulary problem that
    makes a naive windowed ``groupBy(term)`` grow state with distinct
    terms is capped by construction. Tokenization stays JVM-side
    (split + explode before the stateful operator); Python sees Arrow
    batches of a single term column per window group.

    In the exact regime (capacity ≥ window vocabulary) a closed
    window's output EQUALS the batch operator on the same slice
    (value-tested); beyond it, the standard MG undercount bound applies
    per window, reported as ``max_err``.

    Output (append, on window close): window_start, term, est_count,
    max_err.
    """
    from ..model import parse_duration_ms
    win_ms = parse_duration_ms(window)
    cap = int(capacity)
    out_schema = StructType([
        StructField("window_start", LongType()),
        StructField("term", StringType()),
        StructField("est_count", LongType()),
        StructField("max_err", LongType()),
    ])
    state_schema = StructType([
        StructField("terms", ArrayType(StringType())),
        StructField("counts", ArrayType(LongType())),
        StructField("err", LongType()),
    ])

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        win_start = int(key[0])
        if state.hasTimedOut:
            terms, counts, err = state.get
            state.remove()
            top = sorted(zip(counts, terms),
                         key=lambda p: (-p[0], p[1]))[:k]
            if top:
                yield pd.DataFrame(
                    {"window_start": [win_start] * len(top),
                     "term": [t for _, t in top],
                     "est_count": [c for c, _ in top],
                     "max_err": [err] * len(top)})
            return
        if state.exists:
            terms, counts, err = state.get
            counters = dict(zip(terms, counts))
            err = int(err)
        else:
            counters, err = {}, 0
        for pdf in pdfs:
            for term, c in pdf["__term"].value_counts().items():
                c = int(c)
                if term in counters:
                    counters[term] += c
                    continue
                counters[term] = c
                if len(counters) <= cap:
                    continue
                m = min(counters.values())
                err += m
                counters = {t: n - m for t, n in counters.items()
                            if n > m}
        state.update((list(counters.keys()),
                      [int(v) for v in counters.values()], err))
        # fire once the watermark passes the window end; a late-but-
        # in-horizon batch for an already-past window must not set a
        # timestamp at or below the current watermark (Spark rejects it)
        state.setTimeoutTimestamp(
            max(win_start + win_ms, state.getCurrentWatermarkMs() + 1))
        return
        yield  # pragma: no cover — make `update` a generator

    prepared = (stream_df
                .withWatermark(ts_col, watermark)
                .select(
                    F.col(ts_col),  # keep the watermarked column in scope
                    (F.floor(F.unix_millis(F.col(ts_col)
                                           .cast("timestamp"))
                             / F.lit(win_ms)) * F.lit(win_ms))
                    .cast("bigint").alias("__ws"),
                    F.explode(F.split(F.trim(F.col(text_col)), r"\s+"))
                    .alias("__term"))
                .where(F.col("__term") != ""))
    return prepared.groupBy("__ws").applyInPandasWithState(
        update, out_schema, state_schema, "append",
        GroupStateTimeout.EventTimeTimeout)


def stream_distinct_monitor(
    stream_df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "user_id",
    window: str = "1h",
    watermark: str = "10 minutes",
    k: int = 1024,
) -> DataFrame:
    """Streaming distinct-count per tumbling window with BOUNDED state —
    the third member of the monitor family (quantiles, heavy hitters,
    distincts): one KMV (k-minimum-values) sketch per open window.

    State per window is the k smallest 60-bit md5 hashes of the values
    seen — constant however many events/distinct values land. While the
    window has seen ≤ k distinct values the sketch IS the distinct set
    and the count is exact (``exact = true``, value-tested equal to a
    batch ``countDistinct`` on the same slice); beyond that the
    classic KMV estimator ``(k-1) * 2^60 / kth_min`` takes over
    (unbiased, relative error ~1/sqrt(k-2)). Hashing stays JVM-side
    (``portable_hash64`` before the stateful operator); Python sees
    Arrow batches of one hash column.

    Output (append, on window close): window_start, distinct_est,
    exact.
    """
    from ..model import parse_duration_ms
    from ..operators.dedup import portable_hash64
    win_ms = parse_duration_ms(window)
    kk = int(k)
    if kk < 2:
        raise ValueError("stream_distinct_monitor: k must be >= 2")
    out_schema = StructType([
        StructField("window_start", LongType()),
        StructField("distinct_est", LongType()),
        StructField("exact", StringType()),
    ])
    state_schema = StructType([
        StructField("hashes", ArrayType(LongType())),
        StructField("saturated", LongType()),
    ])
    SCALE = 1 << 60

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        win_start = int(key[0])
        if state.hasTimedOut:
            hashes, saturated = state.get
            state.remove()
            if saturated:
                kth = max(hashes)
                est = int(round((kk - 1) * SCALE / kth))
            else:
                est = len(hashes)
            yield pd.DataFrame({"window_start": [win_start],
                                "distinct_est": [est],
                                "exact": ["false" if saturated
                                          else "true"]})
            return
        if state.exists:
            hashes, saturated = state.get
            hs = set(hashes)
            saturated = int(saturated)
        else:
            hs, saturated = set(), 0
        for pdf in pdfs:
            hs.update(int(h) for h in pdf["__h"].unique())
        if len(hs) > kk:
            hs = set(sorted(hs)[:kk])
            saturated = 1
        state.update((sorted(hs), saturated))
        state.setTimeoutTimestamp(
            max(win_start + win_ms, state.getCurrentWatermarkMs() + 1))
        return
        yield  # pragma: no cover — make `update` a generator

    prepared = (stream_df
                .withWatermark(ts_col, watermark)
                .select(
                    F.col(ts_col),
                    (F.floor(F.unix_millis(F.col(ts_col)
                                           .cast("timestamp"))
                             / F.lit(win_ms)) * F.lit(win_ms))
                    .cast("bigint").alias("__ws"),
                    portable_hash64(F.col(value_col).cast("string"))
                    .alias("__h"))
                .where(F.col("__h").isNotNull()))
    return prepared.groupBy("__ws").applyInPandasWithState(
        update, out_schema, state_schema, "append",
        GroupStateTimeout.EventTimeTimeout)
