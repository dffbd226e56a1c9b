"""Slowly-changing-dimension (SCD Type 2) merge.

The dimension-versioning companion to materialization: a feature
platform that snapshots entity attributes (``compute_snapshot``) needs
the standard Kimball Type-2 history table to answer "what did this
entity look like on date X" without storing every snapshot in full. The
reference materializes snapshots blindly
(``/root/reference/feathr-rs/src/materialization.rs``) — history
tracking is the extension every warehouse bolts on next.

Scale: ONE co-partitioned equi join on the entity key (current rows ×
update rows — both shuffle once on the same key, AQE-splittable), with
change classification as a row-local null-safe projection; closed
history rows pass through untouched with zero shuffle. No window
functions, no driver collect.
"""
from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_merge(
    dim: DataFrame,
    updates: DataFrame,
    key_cols: Sequence[str],
    effective_ts,
    compare_cols: Optional[Sequence[str]] = None,
    from_col: str = "effective_from",
    to_col: str = "effective_to",
) -> DataFrame:
    """Merge an attribute snapshot into an SCD Type-2 dimension table.

    ``dim`` carries ``from_col`` / ``to_col`` (NULL ``to_col`` = the
    key's CURRENT version); ``updates`` carries the key + attribute
    columns of a new snapshot taken at ``effective_ts`` (ISO string or
    datetime). Semantics per update key:

    - attributes differ from the current version (null-safe, per
      ``compare_cols`` — default: all shared non-key, non-validity
      columns): the current row CLOSES (``to_col`` = effective_ts) and
      a new version opens (``from_col`` = effective_ts, open-ended);
    - attributes identical: no-op (the current row survives as-is —
      re-running the same snapshot is idempotent);
    - key absent from ``dim``: a first version inserts;
    - key absent from ``updates``: untouched (absence is not a delete
      — feed explicit tombstones as attribute values if needed).

    Contract: ``updates`` is a SNAPSHOT — at most ONE row per key. Two
    rows for one key would fan the full-outer join out (closing and
    re-opening the current version once per duplicate), so the merge
    validates the contract in-plan (a per-key count folded into the
    update aggregation; violation raises at execution, costing no extra
    pass — the join was going to shuffle updates on the key anyway).

    Out-of-order protection: if the key's OPEN row has ``from_col`` >=
    ``effective_ts`` the update is STALE (an older snapshot replayed
    after a newer one) and is ignored for that key — never produces an
    inverted ``[from, to)`` interval. Brand-new keys still insert.

    Already-closed history rows never join or shuffle. Output: the full
    new SCD2 table with the same columns as ``dim``.
    """
    keys = list(key_cols)
    if not keys:
        raise ValueError("scd2_merge: key_cols must be non-empty")
    if compare_cols is None:
        compare_cols = [c for c in dim.columns
                        if c in set(updates.columns)
                        and c not in keys + [from_col, to_col]]
    cmp_cols = list(compare_cols)
    ts = F.lit(str(effective_ts)).cast("timestamp")

    closed = dim.where(F.col(to_col).isNotNull())
    current = dim.where(F.col(to_col).isNull())
    # a matched update row may have all-NULL attributes — presence is
    # tracked with a join-side flag, not attribute nullness. The per-key
    # aggregate both enforces the one-row-per-key contract (raise on
    # duplicates, folded into the flag so pruning can't drop it) and
    # pre-partitions updates on the join key — the full-outer join
    # reuses the partitioning, so the guard adds no extra shuffle.
    upd = (updates
           .groupBy(*keys)
           .agg(F.count(F.lit(1)).alias("__n_upd"),
                *[F.first(c).alias(f"__u_{c}") for c in cmp_cols])
           .select(
               *keys,
               F.when(F.col("__n_upd") == 1, F.lit(True))
               .otherwise(F.raise_error(F.lit(
                   "scd2_merge: updates must contain at most one row "
                   "per key (got duplicates)")))
               .alias("__has_upd"),
               *[F.col(f"__u_{c}") for c in cmp_cols]))

    j = current.join(upd, keys, "full_outer")
    same = F.lit(True)
    for c in cmp_cols:
        same = same & F.col(c).eqNullSafe(F.col(f"__u_{c}"))
    in_dim = F.col(from_col).isNotNull()
    # stale = the open row already starts at/after this snapshot's ts
    # (out-of-order replay): ignore the update rather than invert the
    # validity interval
    stale = in_dim & (F.col(from_col) >= ts)
    changed = in_dim & F.col("__has_upd").isNotNull() & ~same & ~stale

    # surviving current rows: unchanged, or closed out by the update
    survivors = j.where(in_dim).select(
        *keys,
        *[F.col(c) for c in cmp_cols],
        F.col(from_col),
        F.when(changed, ts).otherwise(F.col(to_col)).alias(to_col),
        *[F.col(c) for c in current.columns
          if c not in keys + cmp_cols + [from_col, to_col]])
    # new versions: changed keys + brand-new keys (stale updates on
    # existing keys produce nothing)
    fresh = j.where(F.col("__has_upd").isNotNull()
                    & (~in_dim | (~same & ~stale))).select(
        *keys,
        *[F.col(f"__u_{c}").alias(c) for c in cmp_cols],
        ts.alias(from_col),
        F.lit(None).cast("timestamp").alias(to_col),
        *[F.lit(None).cast(dict(current.dtypes)[c]).alias(c)
          for c in current.columns
          if c not in keys + cmp_cols + [from_col, to_col]])
    cols = dim.columns
    return (closed.select(*cols)
            .unionByName(survivors.select(*cols))
            .unionByName(fresh.select(*cols)))
