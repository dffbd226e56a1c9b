"""Deterministic corpus-sampling operators for training-data pipelines.

All randomness is md5-of-id based — no RNG state, so every engine (and the
DuckDB oracle) derives the identical sample, and re-runs at 100 TB are
reproducible without seed plumbing. md5 hex is lowercase in both Spark and
DuckDB, so order/threshold comparisons agree byte-for-byte.

Scale notes: quota_sample is one window (single shuffle on the group
column; skew = biggest group's rows in one partition — cap small groups or
pre-filter first); hash_split is a pure narrow projection (zero shuffles).
"""

from __future__ import annotations

from typing import Dict

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sample_key(id_col: Column, salt: str = "") -> Column:
    """Deterministic pseudo-random sort key: md5 of salt + id."""
    return F.md5(F.concat(F.lit(salt), id_col.cast("string")))


def quota_sample(df: DataFrame, group_col: str, cap: int,
                 id_col: str = "doc_id", salt: str = "") -> DataFrame:
    """Keep at most ``cap`` rows per group, chosen uniformly-at-"random"
    (deterministic md5 order) — the domain-rebalancing step that stops one
    crawl source from dominating a training mix. One window over a single
    shuffle on ``group_col``."""
    w = Window.partitionBy(group_col).orderBy(
        sample_key(F.col(id_col), salt), F.col(id_col))
    return (df.withColumn("__rk", F.row_number().over(w))
            .where(F.col("__rk") <= cap)
            .drop("__rk"))


def hash_split(df: DataFrame, fractions: Dict[str, float],
               id_col: str = "doc_id", salt: str = "") -> DataFrame:
    """Assign a stable ``split`` label (train/val/test...) per row from the
    first 4 md5 hex chars (65536 buckets): fractions map to cumulative
    hex thresholds, compared as strings. Zero shuffles, stable under
    re-partitioning, resampling-free on incremental data."""
    total = sum(fractions.values())
    assert abs(total - 1.0) < 1e-9, f"fractions must sum to 1, got {total}"
    key = F.substring(sample_key(F.col(id_col), salt), 1, 4)
    expr = None
    cum = 0.0
    items = list(fractions.items())
    for name, frac in items[:-1]:
        cum += frac
        thr = format(int(cum * 65536), "04x")
        cond = key < F.lit(thr)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def split_thresholds_sql(fractions: Dict[str, float]) -> str:
    """The CASE expression a SQL oracle needs to mirror ``hash_split``
    (same 4-hex-char buckets and thresholds) given column ``__sk`` =
    substr(md5(id),1,4)."""
    items = list(fractions.items())
    parts, cum = [], 0.0
    for name, frac in items[:-1]:
        cum += frac
        parts.append(f"WHEN __sk < '{format(int(cum * 65536), '04x')}' "
                     f"THEN '{name}'")
    return "CASE " + " ".join(parts) + f" ELSE '{items[-1][0]}' END"


def weighted_sample(df: DataFrame, weight_col: str,
                    id_col: str = "doc_id", salt: str = "",
                    scale: float = 1.0) -> DataFrame:
    """Deterministic Poisson-style weighted sampling: keep each row with
    probability ``min(1, weight * scale)``, decided by comparing the
    row's md5-derived uniform draw against its own inclusion
    probability — per-row, zero shuffle, no RNG state, and reproducible
    across engines/cluster sizes (the same discipline as
    :func:`hash_split`; quality-score-weighted corpus downsampling is
    the canonical use).

    The uniform draw is the first 15 hex digits of md5(salt + id) mapped
    to [0, 1) — identical to the oracle's SQL expression, so inclusion
    decisions are bit-reproducible.
    """
    draw = (F.conv(F.substring(sample_key(F.col(id_col), salt), 1, 15),
                   16, 10).cast("double") / F.lit(float(16 ** 15)))
    p = F.least(F.col(weight_col).cast("double") * F.lit(float(scale)),
                F.lit(1.0))
    return df.where(draw < p)
