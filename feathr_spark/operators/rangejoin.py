"""Generic point-in-interval range join, shuffle-partitioned by time bin.

The reference's point-in-time join specializes "observation ts falls inside
a feature window" (``feathr-rs/src/model.rs`` join semantics); this operator
generalizes it to arbitrary interval frames: match every point row whose
timestamp lies in ``[start, end)`` of an interval row, with optional extra
equi-keys.

Scale design: a naive ``points JOIN intervals ON ts >= start AND ts < end``
has no equi-key, so Spark plans BroadcastNestedLoopJoin — O(P * I) compares
and a mandatory broadcast. Here both sides are keyed by a time BIN
(``floor(epoch / bin_width)``): each point lands in exactly one bin, each
interval is exploded over the bins it covers, and the join becomes an
ordinary equi shuffle join on ``(bin, *extra_keys)`` that AQE can size and
skew-split. Replication is bounded: an interval generates
``len/bin_width + 2`` rows, so choosing ``bin_width`` near the typical
interval length keeps the blow-up ~2-3x on the (small) interval side while
the 100 TB point side is never replicated. Each matched pair is produced
exactly once (the point's single bin), so no post-join dedup is needed.
"""
from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bin_width_s: int = 3600,
    on: Optional[Sequence[str]] = None,
    how: str = "inner",
) -> DataFrame:
    """Join point rows into interval rows on ``start <= ts < end``.

    ``on`` adds equi-key columns (present on both sides) to the bin key.
    ``how`` is ``inner`` or ``left`` (left = keep unmatched INTERVALS with
    NULL point columns — the interval side is the "query" side).
    Output: all interval columns + all point columns; overlapping names must
    be disambiguated by the caller beforehand.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"range_join: how must be inner|left, got {how!r}")
    on = list(on or [])
    w = int(bin_width_s)
    if w <= 0:
        raise ValueError("range_join: bin_width_s must be positive")

    pt = F.col(point_ts)
    st, en = F.col(start_ts), F.col(end_ts)

    p = points.withColumn("__bin", F.floor(F.unix_timestamp(pt) / w))
    # Explode each interval over every bin it touches. end is exclusive but
    # the boundary bin is kept (cheap) and the precise filter below decides.
    iv = (
        intervals.where(en > st)
        .withColumn(
            "__bin",
            F.explode(
                F.sequence(
                    F.floor(F.unix_timestamp(st) / w),
                    F.floor(F.unix_timestamp(en) / w),
                )
            ),
        )
    )
    # Name-list join keys: both sides may share lineage (self range joins
    # over one source frame are common), and expression conditions like
    # iv["__bin"] == p["__bin"] trip Spark's ambiguous-self-join detection.
    keys = ["__bin"] + on
    precise = (pt >= st) & (pt < en)
    pcols = [c for c in points.columns if c not in on]
    icols = list(intervals.columns)

    if how == "inner":
        joined = iv.join(p, keys, "inner").where(precise)
        return joined.select(*icols, *pcols)

    # LEFT: intervals keep one row when nothing matches. The exploded frame
    # would emit one null-row PER BIN, so join inner first, then re-attach
    # never-matched intervals via a broadcast-able anti join on the interval
    # side only (the point side is never scanned twice).
    matched_out = (iv.join(p, keys, "inner").where(precise)
                   .select(*icols, *pcols))
    misses = intervals.join(
        matched_out.select(*icols).distinct(), icols, "left_anti"
    )
    null_p = misses.select(
        *icols, *[F.lit(None).cast(points.schema[c].dataType).alias(c)
                  for c in pcols]
    )
    return matched_out.unionByName(null_p)
