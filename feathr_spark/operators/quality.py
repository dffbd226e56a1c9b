"""Data-quality gates and snapshot diffing for feature frames.

The operational companions to materialization (SURVEY §2.7): validate a
frame before it ships to an online store, and diff two materialized
snapshots to see what a refresh actually changed. The reference ships
features blindly (``feathr-rs/src/materialization.rs`` has no validation
step); production feature platforms gate on exactly these checks.

Scale design: ``dq_check`` folds EVERY rule into ONE aggregate pass over
the frame (a single scan, one tiny result row fanned out to one row per
rule) — never one job per rule. ``snapshot_diff`` is a single full outer
join on the entity key with change classification in the projection; the
per-class counts aggregate the (already joined) rows once.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dq_check(
    df: DataFrame,
    min_rows: Optional[int] = None,
    unique: Sequence[str] = (),
    not_null: Sequence[str] = (),
    max_null_frac: Optional[Dict[str, float]] = None,
    in_range: Optional[Dict[str, tuple]] = None,
) -> DataFrame:
    """Declarative data-quality report: one row per rule with the
    measured value and a pass flag — ALL rules evaluate in a single
    aggregate pass (one scan; uniqueness uses ``count_distinct`` inside
    the same aggregation, so no extra jobs).

    Rules: ``min_rows`` (frame-level), ``unique`` (no duplicate values,
    NULLs don't count as duplicates — SQL UNIQUE semantics),
    ``not_null`` (zero NULLs), ``max_null_frac`` (col -> allowed null
    fraction), ``in_range`` (col -> (lo, hi) inclusive bounds on
    non-null values).

    Output: (rule, column, measured, threshold, passed) — ``measured``/
    ``threshold`` as doubles for a uniform schema. Gate with
    ``.where(~F.col('passed'))`` + ``.isEmpty()``.
    """
    aggs: List = [F.count(F.lit(1)).alias("__n")]
    for c in set(unique):
        aggs.append(F.count_distinct(F.col(c)).alias(f"__u_{c}"))
        aggs.append(F.count(F.col(c)).alias(f"__un_{c}"))
    null_cols = set(not_null) | set(max_null_frac or {})
    for c in null_cols:
        aggs.append(F.count_if(F.col(c).isNull()).alias(f"__z_{c}"))
    for c, (lo, hi) in (in_range or {}).items():
        aggs.append(F.count_if(
            F.col(c).isNotNull() &
            ((F.col(c) < F.lit(lo)) | (F.col(c) > F.lit(hi))))
            .alias(f"__r_{c}"))
    stats = df.agg(*aggs)

    rows: List = []

    def rule(name, col, measured, threshold, passed):
        rows.append(F.struct(
            F.lit(name).alias("rule"), F.lit(col).alias("column"),
            measured.cast("double").alias("measured"),
            F.lit(float(threshold)).alias("threshold"),
            passed.alias("passed")))

    n = F.col("__n")
    if min_rows is not None:
        rule("min_rows", "", n, min_rows, n >= F.lit(int(min_rows)))
    for c in sorted(set(unique)):
        dup = F.col(f"__un_{c}") - F.col(f"__u_{c}")
        rule("unique", c, dup, 0, dup == 0)
    for c in sorted(set(not_null)):
        z = F.col(f"__z_{c}")
        rule("not_null", c, z, 0, z == 0)
    for c in sorted(max_null_frac or {}):
        frac = F.when(n > 0, F.col(f"__z_{c}") / n).otherwise(F.lit(0.0))
        thr = float(max_null_frac[c])
        rule("max_null_frac", c, frac, thr, frac <= F.lit(thr))
    for c in sorted(in_range or {}):
        bad = F.col(f"__r_{c}")
        rule("in_range", c, bad, 0, bad == 0)
    if not rows:
        raise ValueError("dq_check: no rules given")
    return (stats.select(F.explode(F.array(*rows)).alias("r"))
            .select("r.rule", "r.column", "r.measured", "r.threshold",
                    "r.passed"))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Optional[Sequence[str]] = None,
    summary: bool = False,
) -> DataFrame:
    """Diff two feature snapshots on their entity key: which keys were
    ``added``, ``removed``, ``changed``, or ``unchanged`` between a prior
    materialization and a refresh.

    One full outer join on the key (both sides shuffle once on the same
    key — co-partitioned, AQE-splittable); change classification is a
    row-local projection using null-safe equality (``<=>``) per compared
    column, so NULL→value and value→NULL count as changes but NULL→NULL
    does not. ``compare_cols`` defaults to all shared non-key columns.

    Output: key columns + ``change`` (string); with ``summary=True``, the
    per-class counts instead (4 rows, zero-count classes included).
    """
    keys = list(key_cols)
    if compare_cols is None:
        compare_cols = [c for c in old.columns
                        if c in set(new.columns) and c not in keys]
    o = old.select(*keys, F.lit(True).alias("__in_old"),
                   *[F.col(c).alias(f"__o_{c}") for c in compare_cols])
    nw = new.select(*keys, F.lit(True).alias("__in_new"),
                    *[F.col(c).alias(f"__n_{c}") for c in compare_cols])
    j = o.join(nw, keys, "full_outer")
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
    change = (F.when(F.col("__in_old").isNull(), "added")
              .when(F.col("__in_new").isNull(), "removed")
              .when(same, "unchanged").otherwise("changed"))
    diff = j.select(*keys, change.alias("change"))
    if not summary:
        return diff
    counts = diff.groupBy("change").agg(F.count("*").alias("n"))
    classes = old.sparkSession.createDataFrame(
        [("added",), ("removed",), ("changed",), ("unchanged",)],
        "change string")
    return (F.broadcast(classes).join(counts, "change", "left")
            .select("change",
                    F.coalesce(F.col("n"), F.lit(0)).cast("bigint")
                    .alias("n")))
