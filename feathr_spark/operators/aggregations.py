"""Aggregation-function mapping for window and snapshot aggregations.

Covers every reference Aggregation variant
(/root/reference/feathr-rs/src/model.rs:200-216) plus the COUNT extension.
All constructions stay JVM-side (built-in functions / higher-order
functions) — no Python UDFs in the hot path.

``make_agg`` returns ``(aggregate, post)`` where ``aggregate`` is a pure
aggregate expression (legal both in ``groupBy().agg`` and with
``.over(window)``) and ``post`` is a scalar post-transform applied to the
aggregated value (e.g. sorting a collected list) — needed because wrapping
an aggregate in a scalar function before ``.over`` is not legal Spark.
"""

from __future__ import annotations

from typing import Callable, Tuple

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..model import Aggregation

_ELEMENTWISE = {
    Aggregation.ELEMENTWISE_AVG, Aggregation.ELEMENTWISE_MIN,
    Aggregation.ELEMENTWISE_MAX, Aggregation.ELEMENTWISE_SUM,
}


def elementwise_reduce(lists: Column, agg: Aggregation) -> Column:
    """Element-wise reduce an ``array<array<T>>`` column.

    ELEMENTWISE_AVG/MIN/MAX/SUM over 1-d dense tensors (model.rs:209).
    Uses ``aggregate``+``zip_with`` higher-order functions (whole-stage
    codegen'd, no UDF). Empty input → null.
    """
    if agg in (Aggregation.ELEMENTWISE_SUM, Aggregation.ELEMENTWISE_AVG):
        merge = lambda acc, x: F.zip_with(acc, x, lambda a, b: a + b)
    elif agg == Aggregation.ELEMENTWISE_MIN:
        merge = lambda acc, x: F.zip_with(acc, x, lambda a, b: F.least(a, b))
    elif agg == Aggregation.ELEMENTWISE_MAX:
        merge = lambda acc, x: F.zip_with(acc, x, lambda a, b: F.greatest(a, b))
    else:
        raise ValueError(f"not an elementwise aggregation: {agg}")

    n = F.size(lists)
    head = F.element_at(lists, 1)
    tail = F.slice(lists, 2, F.greatest(n - 1, F.lit(0)))
    reduced = F.aggregate(tail, head, merge)
    if agg == Aggregation.ELEMENTWISE_AVG:
        reduced = F.transform(reduced, lambda x: x / n)
    return F.when(n > 0, reduced)


def elementwise_reduce_sparse(maps: Column, agg: Aggregation) -> Column:
    """Element-wise reduce an ``array<map<K, V>>`` column — the SPARSE
    tensor counterpart of :func:`elementwise_reduce` (SURVEY §1.2 maps
    the reference's ``TensorCategory::SPARSE`` to ``MapType``; the
    reference declares the category, model.rs:44-47, but its test surface
    never exercises it — semantics documented here as the engine's
    contract):

    - SUM/AVG: missing coordinates are implicit zeros (true sparse-tensor
      semantics); AVG divides by the TOTAL tensor count ``n``.
    - MIN/MAX: reduce over PRESENT values per key only — the implicit-
      zero reading would collapse every partially-present key to ≤0/≥0,
      which discards exactly the information a sparse min/max carries.

    All map unions happen via ``map_zip_with`` higher-order functions
    (JVM-side, no UDF). Empty input → null.
    """
    if agg in (Aggregation.ELEMENTWISE_SUM, Aggregation.ELEMENTWISE_AVG):
        merge = lambda acc, x: F.map_zip_with(
            acc, x, lambda k, a, b:
            F.coalesce(a, F.lit(0.0)) + F.coalesce(b, F.lit(0.0)))
    elif agg == Aggregation.ELEMENTWISE_MIN:
        merge = lambda acc, x: F.map_zip_with(
            acc, x, lambda k, a, b: F.coalesce(F.least(a, b), a, b))
    elif agg == Aggregation.ELEMENTWISE_MAX:
        merge = lambda acc, x: F.map_zip_with(
            acc, x, lambda k, a, b: F.coalesce(F.greatest(a, b), a, b))
    else:
        raise ValueError(f"not an elementwise aggregation: {agg}")

    n = F.size(maps)
    head = F.element_at(maps, 1)
    tail = F.slice(maps, 2, F.greatest(n - 1, F.lit(0)))
    reduced = F.aggregate(tail, head, merge)
    if agg == Aggregation.ELEMENTWISE_AVG:
        reduced = F.transform_values(reduced, lambda k, v: v / n)
    return F.when(n > 0, reduced)


def make_agg(agg: Aggregation, value: Column, ts: Column,
             param: float = None, obs_ts: Column = None,
             ) -> Tuple[Column, Callable[[Column], Column]]:
    """(aggregate expression, scalar post-transform) for one frame/group.

    ``value`` is null outside the aggregation's filter; all builtins here
    ignore nulls, which implements the pre-aggregation ``filter`` clause
    (model.rs:270) for free. ``param`` parameterizes PERCENTILE (the
    fraction) and DECAY_SUM/DECAY_AVG (half-life in days) and is ignored
    elsewhere. ``obs_ts`` is the observation-time epoch-ms column the post
    transform may reference (required by the DECAY aggregations; the
    callers guarantee it is legal in the post context — the current row in
    a window select, a grouping column in ``groupBy().agg``).
    """
    ident = lambda c: c
    if agg in (Aggregation.DECAY_SUM, Aggregation.DECAY_AVG):
        # Exponentially time-decayed sum / weighted mean. The frame state
        # is the (value, ts) pair list — the exact-arithmetic formulation:
        # weights use only NON-POSITIVE exponents ((t - obs)/half <= 0
        # inside any window frame), so no overflow for any half-life /
        # time-range combination, unlike the sum(v * exp(k*t)) * exp(-k*obs)
        # factorization whose intermediate blows up past ~710/k. Same
        # state class as UNION/PERCENTILE (memory caveat documented there);
        # decayed partials are mergeable by rescaling to a common reference
        # time if an incremental rollup is needed (profile.merge_rollups
        # pattern).
        if param is None or float(param) <= 0.0:
            raise ValueError(
                f"{agg.value} requires agg_param = half-life in days > 0, "
                f"got {param!r}")
        if obs_ts is None:
            raise ValueError(f"{agg.value} requires the observation-time "
                             "column (obs_ts)")
        half_ms = float(param) * 86400000.0
        pairs = F.collect_list(
            F.when(value.isNotNull() & ts.isNotNull(),
                   F.struct(value.cast("double").alias("v"),
                            ts.cast("double").alias("t"))))
        weighted = lambda x: x["v"] * F.pow(
            F.lit(0.5), (obs_ts.cast("double") - x["t"]) / F.lit(half_ms))
        wsum = lambda c: F.aggregate(
            c, F.lit(0.0), lambda acc, x: acc + weighted(x))
        if agg == Aggregation.DECAY_SUM:
            post = lambda c: F.when(F.size(c) > 0, wsum(c))
        else:
            den = lambda c: F.aggregate(
                c, F.lit(0.0),
                lambda acc, x: acc + F.pow(
                    F.lit(0.5),
                    (obs_ts.cast("double") - x["t"]) / F.lit(half_ms)))
            post = lambda c: F.when(F.size(c) > 0, wsum(c) / den(c))
        return pairs, post
    if agg == Aggregation.PERCENTILE:
        # exact interpolated percentile — ANSI PERCENTILE_CONT semantics
        # ((n-1)·p rank, linear interpolation), identical to DuckDB
        # quantile_cont. Window-frame-legal (plain aggregate, not an
        # ordered-set syntax). State is the frame's value list — same
        # class as UNION/COUNT_DISTINCT; for 100 TB high-cardinality
        # windows pre-bucket values or use approx_percentile upstream.
        if param is None or not (0.0 <= float(param) <= 1.0):
            raise ValueError(
                "PERCENTILE requires agg_param in [0, 1], got "
                f"{param!r}")
        return F.percentile(value, F.lit(float(param))), ident
    if agg == Aggregation.AVG:
        return F.avg(value), ident
    if agg == Aggregation.SUM:
        return F.sum(value), ident
    if agg == Aggregation.MIN:
        return F.min(value), ident
    if agg == Aggregation.MAX:
        return F.max(value), ident
    if agg == Aggregation.COUNT:
        return F.count(value), ident
    if agg == Aggregation.COUNT_DISTINCT:
        # collect_set + size is window-frame-legal (COUNT(DISTINCT) isn't
        # allowed over a range frame); state is one entry per distinct
        # value, the same as any exact distinct count. For cardinality at
        # 100 TB scale prefer an approx sketch upstream.
        return F.collect_set(value), F.size
    if agg == Aggregation.APPROX_COUNT_DISTINCT:
        # HLL++ sketch (Spark default rsd = 0.05): fixed-size state per
        # group/frame instead of COUNT_DISTINCT's per-distinct-value
        # collect_set entry — the memory-safe variant for high-cardinality
        # 100 TB windows. Ignores nulls, so the filter clause works as for
        # every other aggregate here.
        return F.approx_count_distinct(value), ident
    if agg == Aggregation.NOP:
        # "no aggregation — pick value as-is": earliest value in scope.
        return F.min_by(value, F.when(value.isNotNull(), ts)), ident
    if agg == Aggregation.LATEST:
        # value with max timestamp (model.rs:214)
        return F.max_by(value, F.when(value.isNotNull(), ts)), ident
    if agg == Aggregation.UNION:
        # collect into one list; sorted for deterministic output
        return F.collect_list(value), F.array_sort
    if agg in _ELEMENTWISE:
        return F.collect_list(value), (lambda c, a=agg: elementwise_reduce(c, a))
    raise ValueError(f"unsupported aggregation: {agg}")


def simple_agg(agg: Aggregation, value: Column, ts: Column,
               param: float = None, obs_ts: Column = None) -> Column:
    """Single-expression form for ``groupBy().agg`` contexts (scalar
    wrappers over aggregates are legal there). ``obs_ts`` must be a
    grouping column when given (DECAY aggregations reference it)."""
    a, post = make_agg(agg, value, ts, param, obs_ts)
    return post(a)
