"""Multi-dimensional data layout: Z-order clustering for written files.

At 100 TB the dominant cost of most queries is the SCAN, and the scan
is cheap exactly when file/row-group min-max statistics let the reader
skip data (parquet predicate pushdown prunes a file when the filter
value falls outside its footer range). A table sorted by one column
prunes on that column only; Z-ORDERING sorts by the bit-interleaved
value of SEVERAL columns, so files end up tight in every participating
dimension at once — the layout behind Delta's ``OPTIMIZE ZORDER BY``
and ClickHouse/Databricks multi-dimensional clustering. The reference
writes snapshots blindly (``feathr-rs/src/materialization.rs``); this
is the write-side scale extension that makes the written feature
tables cheap to re-read selectively.

Plan shape: one 1-row min/max aggregate per call (broadcast), a
row-local bit-interleave projection (pure codegen arithmetic — no UDF),
and one range shuffle to order the files. Nothing here is data-shaped
except the single range exchange the write needed anyway.
"""
from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZKEY = "__zkey"


def _normalize(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Map a value into [0, 2^bits) by min-max scaling (the standard
    z-value normalization). NULLs map to 0 (sort first, one cluster);
    constant columns map everything to 0."""
    span = hi.cast("double") - lo.cast("double")
    frac = F.when(span > 0,
                  (col.cast("double") - lo.cast("double")) / span) \
        .otherwise(F.lit(0.0))
    scaled = F.least(F.floor(frac * F.lit(float(1 << bits))),
                     F.lit((1 << bits) - 1)).cast("bigint")
    return F.coalesce(scaled, F.lit(0))


def with_zorder_key(
    df: DataFrame,
    cols: Sequence[str],
    bits: Optional[int] = None,
) -> DataFrame:
    """Add ``__zkey``: the bit-interleaved (Morton) key of ``cols``.

    Each column min-max normalizes to a ``bits``-wide integer from a
    broadcast 1-row bounds frame (timestamps/numerics cast to double);
    bit j of column i lands at position ``j * n_cols + i`` so all
    columns contribute equally at every scale of the curve. ``bits``
    defaults to ``63 // n_cols`` (the widest interleave that fits a
    signed 64-bit key — 31 bits/col for 2 columns, 21 for 3, 15 for 4).

    The key is ordering state, not data — drop it after sorting.
    """
    cols = list(cols)
    if not 1 <= len(cols) <= 8:
        raise ValueError("zorder: need 1-8 columns")
    k = len(cols)
    if bits is None:
        bits = 63 // k
    if bits * k > 63:
        raise ValueError(f"zorder: {k} cols x {bits} bits exceeds 63")
    bounds = df.agg(*[f for c in cols for f in (
        F.min(F.col(c).cast("double")).alias(f"__lo_{c}"),
        F.max(F.col(c).cast("double")).alias(f"__hi_{c}"))])
    out = df.crossJoin(F.broadcast(bounds))
    z = F.lit(0).cast("bigint")
    for i, c in enumerate(cols):
        v = _normalize(F.col(c), F.col(f"__lo_{c}"), F.col(f"__hi_{c}"),
                       bits)
        for j in range(bits):
            z = z.bitwiseOR(F.shiftleft(
                F.shiftright(v, j).bitwiseAND(F.lit(1)), j * k + i))
    return out.select(*df.columns, z.alias(ZKEY))


def zorder_sort(
    df: DataFrame,
    cols: Sequence[str],
    num_parts: Optional[int] = None,
    bits: Optional[int] = None,
) -> DataFrame:
    """Range-partition + locally sort ``df`` along the Z-curve of
    ``cols`` and drop the key — ready to write. Each output file then
    covers a tight hyper-rectangle in every clustered dimension, so
    min-max footer pruning works for filters on ANY of the columns
    (one range exchange; the sort is within partitions only — no
    global single-task sort)."""
    keyed = with_zorder_key(df, cols, bits)
    if num_parts:
        keyed = keyed.repartitionByRange(int(num_parts), F.col(ZKEY))
    else:
        keyed = keyed.repartitionByRange(F.col(ZKEY))
    return keyed.sortWithinPartitions(ZKEY).drop(ZKEY)
