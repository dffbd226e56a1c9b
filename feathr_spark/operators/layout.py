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
from pyspark.sql import types as T

ZKEY = "__zkey"


def _sortable_double(df: DataFrame, c: str) -> Column:
    """Project column ``c`` to a DOUBLE whose order matches the column's
    natural order, so min-max z-normalization is meaningful for every
    supported type (a silent ``cast("double")`` of a string is NULL for
    all rows — the column would contribute nothing to the key).

    - numerics / booleans / timestamps: plain cast (epoch seconds);
    - dates: day number (``unix_date``);
    - strings / binary: big-endian value of the first 6 BYTES
      (48 bits — exact in a double), zero-right-padded so shorter
      values order correctly. Order-preserving for the byte prefix,
      which matches how parquet footer min/max prunes strings
      (lexicographic) — and is purely row-local codegen arithmetic,
      unlike a rank projection (global sort) or a hash (order-destroying).

    Raises ``ValueError`` for array/map/struct columns.
    """
    dt = df.schema[c].dataType
    col = F.col(c)
    if isinstance(dt, (T.StringType, T.BinaryType)):
        raw = col if isinstance(dt, T.BinaryType) else F.encode(col, "UTF-8")
        hx = F.rpad(F.substring(F.hex(raw), 1, 12), 12, "0")
        return F.conv(hx, 16, 10).cast("double")
    if isinstance(dt, T.DateType):
        return F.unix_date(col).cast("double")
    if isinstance(dt, (T.NumericType, T.BooleanType, T.TimestampType,
                       T.TimestampNTZType)):
        return col.cast("double")
    raise ValueError(
        f"zorder: column {c!r} has unsupported type {dt.simpleString()}")


def _normalize(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Map a value into [0, 2^bits) by min-max scaling (the standard
    z-value normalization). NULLs map to 0 (sort first, one cluster);
    constant columns map everything to 0."""
    span = hi.cast("double") - lo.cast("double")
    frac = F.when(span > 0,
                  (col.cast("double") - lo.cast("double")) / span) \
        .otherwise(F.lit(0.0))
    # coalesce BEFORE least: Spark's least() skips NULL operands, so a
    # NULL frac would otherwise resolve to the (1<<bits)-1 cap — NULLs
    # clustering at the TOP of every dimension instead of the bottom.
    scaled = F.least(F.floor(F.coalesce(frac, F.lit(0.0))
                             * F.lit(float(1 << bits))),
                     F.lit((1 << bits) - 1)).cast("bigint")
    return scaled


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
    projs = {c: _sortable_double(df, c) for c in cols}
    bounds = df.agg(*[f for c in cols for f in (
        F.min(projs[c]).alias(f"__lo_{c}"),
        F.max(projs[c]).alias(f"__hi_{c}"))])
    out = df.crossJoin(F.broadcast(bounds))
    z = F.lit(0).cast("bigint")
    for i, c in enumerate(cols):
        v = _normalize(projs[c], F.col(f"__lo_{c}"), F.col(f"__hi_{c}"),
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


def compaction_plan(
    df: DataFrame,
    size_col: str,
    id_col: str,
    by: Sequence[str] = (),
    target_bytes: int = 128 * 1024 * 1024,
) -> DataFrame:
    """Cumulative bin-packing compaction plan — the OPTIMIZE/compaction
    primitive of lakehouse table maintenance: assign items (small files,
    documents, row groups) to target-size output bins. Items sort
    largest-first within each ``by`` group (first-fit-decreasing's sort,
    next-fit's scan — the streaming-friendly variant every table
    compactor actually ships, because true FFD is inherently
    sequential), then ``bin = floor(preceding_cumsum / target)``: a bin
    closes as soon as the running total crosses the target, so every
    bin lands within one item's size of the target (an item that
    overshoots a boundary opens the next bin already part-full on the
    cumsum axis, shorting that bin's bytes by the overshoot;
    largest-first ordering keeps tail items — hence overshoots —
    small). Bin ids are monotone but NOT dense: an item larger than
    ``target_bytes`` occupies several widths of the cumsum axis and the
    ids under it are skipped — treat ids as labels, not ordinals.

    One keyed window shuffle (partition by group); the usual window
    caveat: a group's items sort in one task — shard the group key when
    a single table's small-file count outgrows a task (the plan is
    per-group-independent by construction, so sharding is safe).

    All arithmetic is exact integers: the same plan comes out of any
    engine at any partitioning.

    Output: one row per (by..., bin_id) with n_items, bin_bytes.
    """
    from pyspark.sql import Window
    keys = list(by)
    sz = F.col(size_col).cast("bigint")
    w = (Window.partitionBy(*keys) if keys else Window.partitionBy()) \
        .orderBy(sz.desc(), F.col(id_col).asc())
    cum_before = (F.sum(sz).over(
        w.rowsBetween(Window.unboundedPreceding, 0)) - sz)
    staged = df.select(*keys, sz.alias("__sz"),
                       F.floor(cum_before / F.lit(int(target_bytes)))
                       .cast("bigint").alias("bin_id"))
    return (staged.groupBy(*keys, "bin_id")
            .agg(F.count("*").cast("bigint").alias("n_items"),
                 F.sum("__sz").cast("bigint").alias("bin_bytes")))
