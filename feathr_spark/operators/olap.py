"""Multi-level OLAP aggregation: GROUPING SETS / rollup / cube and pivot.

The reference engine's transformation DSL is raw Spark SQL
(``feathr-rs/src/model.rs:248-253``), so multi-level aggregates are part of
the query surface a reference user can express; here they are first-class
operators with a single-pass physical plan.

Scale design: ``grouping_sets_agg`` compiles to ONE ``Expand`` node feeding
ONE hash aggregate — every grouping level is computed in a single scan and a
single shuffle, instead of the naive N-scans-plus-union plan. ``Expand``
multiplies rows map-side (one replica per grouping set) but partial
aggregation collapses them before the exchange, so the shuffle volume is
bounded by the group cardinality, not the input size. ``pivot_agg`` takes the
pivot domain explicitly so no plan-time ``distinct().collect()`` scan of a
100 TB table is needed; the result is one ordinary hash aggregate with a
CASE-per-bucket projection (no per-value scans, no shuffle per column).
"""
from __future__ import annotations

from typing import Dict, List, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grouping_sets_agg(
    df: DataFrame,
    group_sets: Sequence[Sequence[str]],
    aggs: Dict[str, str],
    all_label: str = "ALL",
) -> DataFrame:
    """Aggregate ``df`` at several grouping levels in ONE pass.

    ``group_sets`` is a list of column-name tuples — e.g.
    ``[("a", "b"), ("a",), ()]`` computes the detail level, the per-``a``
    subtotal and the grand total, exactly like SQL
    ``GROUP BY GROUPING SETS ((a, b), (a), ())``.

    ``aggs`` maps output alias -> aggregate SQL expression (plain ANSI SQL,
    e.g. ``{"n": "count(*)", "total": "sum(x)"}``).

    Every grouping column appears in the output as a STRING column where
    levels that do not group by it carry ``all_label``. The label is driven
    by ``GROUPING(col)`` — not by null-ness — so genuinely NULL group values
    survive as NULLs and cannot collide with the subtotal rows.
    """
    cols: List[str] = []
    for gs in group_sets:
        for c in gs:
            if c not in cols:
                cols.append(c)
    sets_sql = ", ".join("(" + ", ".join(gs) + ")" for gs in group_sets)
    proj = ", ".join(
        f"CASE WHEN grouping({c}) = 1 THEN '{all_label}' "
        f"ELSE CAST({c} AS STRING) END AS {c}"
        for c in cols
    )
    agg_sql = ", ".join(f"{expr} AS {alias}" for alias, expr in aggs.items())
    view = "__gsets_input"
    df.createOrReplaceTempView(view)
    return df.sparkSession.sql(
        f"SELECT {proj}, {agg_sql} FROM {view} "
        f"GROUP BY GROUPING SETS ({sets_sql})"
    )


def pivot_agg(
    df: DataFrame,
    key_cols: Sequence[str],
    pivot_col: str,
    value_col: str,
    values: Sequence[str],
    agg: str = "sum",
) -> DataFrame:
    """Pivot ``pivot_col`` into one aggregate column per value in ``values``.

    The pivot domain is explicit (``values``) so Spark skips the plan-time
    ``SELECT DISTINCT`` pass over the input — mandatory at 100 TB. Output
    columns are named ``{agg}_{value}``. Rows whose ``pivot_col`` is outside
    ``values`` contribute to no bucket; keys with no rows for a bucket get
    NULL (SQL semantics — use ``coalesce`` downstream for a zero-fill).
    """
    agg_fn = getattr(F, agg)
    pivoted = (
        df.groupBy(*[F.col(k) for k in key_cols])
        .pivot(pivot_col, list(values))
        .agg(agg_fn(F.col(value_col)))
    )
    renamed = pivoted
    for v in values:
        renamed = renamed.withColumnRenamed(v, f"{agg}_{v}")
    return renamed


def topk_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str,
    k: int,
    ascending: bool = False,
    tie_cols: Sequence[str] = (),
) -> DataFrame:
    """Generic top-``k`` rows per group by ``order_col`` (plus explicit
    ``tie_cols`` so the cut is deterministic when order values repeat).

    Formulated as a rank-filtered window so Spark's WindowGroupLimit
    pushes the per-group limit BELOW the shuffle: each map task keeps at
    most k rows per group before the exchange, so the shuffle volume is
    ``k * groups``, not the input size — the scalable group-wise top-k
    (asserted in the plan test). Adds ``rank_in_group`` (1-based).
    """
    from pyspark.sql import Window
    if k <= 0:
        raise ValueError("topk_per_group: k must be positive")
    oc = F.col(order_col).asc() if ascending else F.col(order_col).desc()
    order = [oc] + [F.col(c).asc() for c in tie_cols]
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (df.withColumn("rank_in_group", F.row_number().over(w))
            .where(F.col("rank_in_group") <= int(k))
            .withColumn("rank_in_group",
                        F.col("rank_in_group").cast("bigint")))
