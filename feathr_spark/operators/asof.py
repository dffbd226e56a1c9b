"""Generic as-of (point-in-time) join.

The engine's feature join (operators/point_in_time.py) implements the
reference's windowed-feature semantics; this is the GENERAL operator —
"for each left row, the single right row with the greatest right_ts ≤
left_ts (backward) / smallest right_ts ≥ left_ts (forward), matching the
equality keys" — exposed directly, the way a time-series engine exposes
ASOF JOIN.

Physical design (the 100 TB shape): Spark has no as-of join operator,
and the naive interval join explodes every left row onto its entire
right history before a per-row argmax prunes it. Instead both sides
UNION into one frame ordered by (ts, side) per key: a single hash
shuffle on the keys, one sort, and a running ``last(right_payload,
ignorenulls=true)`` window carries the newest right row forward onto
each left row — O(|L|+|R|) rows through the shuffle, zero duplication,
AQE-splittable per key. Equal timestamps order the right row FIRST, so
``right_ts == left_ts`` matches (the inclusive bound, same as DuckDB's
``ASOF JOIN ... ON l.ts >= r.ts``).

NULL semantics follow SQL joins: right rows with a NULL key or NULL
timestamp can never match and are dropped from the union; left rows
always survive (left-join), with NULL attachments when nothing matched.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str = "ts",
    right_ts: Optional[str] = None,
    direction: str = "backward",
    tolerance: Optional[str] = None,
    suffix: str = "_r",
) -> DataFrame:
    """As-of left join ``right`` onto ``left`` by ``keys``.

    ``direction``: ``"backward"`` (newest right at-or-before the left
    timestamp — the default, trade-vs-quote semantics) or ``"forward"``
    (earliest right at-or-after). ``tolerance``: optional HOCON duration
    (``"30m"``, ``"2h"``) — a match further than this from the left
    timestamp is discarded (attachment becomes NULL), mirroring
    pandas ``merge_asof(tolerance=...)``.

    Output: every left row/column, plus each right non-key column
    renamed with ``suffix`` (the right timestamp arrives as
    ``{right_ts}{suffix}``). One shuffle on ``keys``; no row duplication.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward, "
                         f"got {direction!r}")
    keys = list(keys)
    right_ts = right_ts or left_ts
    r_payload = [c for c in right.columns if c not in keys]
    if not r_payload:
        raise ValueError("right side has no payload columns")
    out_names = [f"{c}{suffix}" for c in r_payload]
    clash = set(out_names) & set(left.columns)
    if clash:
        raise ValueError(f"suffixed right columns clash with left: {clash}")

    # union frame: __ord is the event time on both sides; __side orders the
    # right row first at equal timestamps (inclusive bound)
    matchable = F.col(right_ts).isNotNull()
    for k in keys:
        matchable = matchable & F.col(k).isNotNull()
    r_rows = (right
              .where(matchable)
              .select(*keys,
                      F.col(right_ts).alias("__ord"),
                      F.lit(0).alias("__side"),
                      F.struct(*[F.col(c) for c in r_payload])
                      .alias("__rp"),
                      *[F.lit(None).alias(f"__l_{c}")
                        for c in left.columns]))
    l_rows = left.select(
        *keys,
        F.col(left_ts).alias("__ord"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r_rows.schema["__rp"].dataType).alias("__rp"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns])

    ordcol = (F.col("__ord").asc_nulls_first() if direction == "backward"
              else F.col("__ord").desc_nulls_first())
    w = (Window.partitionBy(*keys)
         .orderBy(ordcol, F.col("__side").asc())
         .rowsBetween(Window.unboundedPreceding, 0))
    attached = (r_rows.unionByName(l_rows)
                .withColumn("__at", F.last("__rp", ignorenulls=True).over(w))
                .where(F.col("__side") == 1))

    if tolerance is not None:
        from ..model import parse_duration_ms
        tol_ms = parse_duration_ms(tolerance)
        rt = F.col("__at").getField(right_ts) if right_ts in r_payload \
            else None
        if rt is None:
            raise ValueError("tolerance requires the right timestamp "
                             "column in the right payload")
        # cast: parquet timestamps load as TIMESTAMP_NTZ in Spark 4 and
        # unix_millis only accepts TIMESTAMP
        lo = F.unix_millis(F.col("__ord").cast("timestamp"))
        ro = F.unix_millis(rt.cast("timestamp"))
        gap = lo - ro if direction == "backward" else ro - lo
        attached = attached.withColumn(
            "__at", F.when(gap <= tol_ms, F.col("__at")))

    return attached.select(
        *[F.col(f"__l_{c}").alias(c) for c in left.columns],
        *[F.col("__at").getField(c).alias(f"{c}{suffix}")
          for c in r_payload])
