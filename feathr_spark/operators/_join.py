"""Null-safe keyed broadcast attach — the shared fix for the NULL-key
drop class (ADVICE r6, mad_outliers): an operator that ``groupBy(keys)``
aggregates a small stats frame and equi-joins it back drops every row
whose key is NULL, even though those rows formed a ``groupBy`` group —
the group is computed and then silently discarded by the join. Matching
with ``<=>`` (eqNullSafe) scores NULL-key groups like any other.

``EqualNullSafe`` is a supported equi-join key, so the join still plans
as a BroadcastHashJoin — no plan-shape cost over the plain equi-join.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def broadcast_attach(left: DataFrame, right: DataFrame,
                     keys: Sequence[str], how: str = "inner") -> DataFrame:
    """Join ``right`` (a group-count-sized stats frame, broadcast) back
    onto ``left`` on ``keys`` with null-safe key equality; ``right``'s
    key columns are dropped from the output (USING-join column shape).
    With ``keys`` empty this is the 1-row ``crossJoin`` attach.
    """
    keys = list(keys)
    if not keys:
        return left.crossJoin(F.broadcast(right))
    r = right
    for k in keys:
        r = r.withColumnRenamed(k, f"__r_{k}")
    cond = [left[k].eqNullSafe(r[f"__r_{k}"]) for k in keys]
    out = left.join(F.broadcast(r), cond, how)
    return out.drop(*[f"__r_{k}" for k in keys])


def salted_join(left: DataFrame, right: DataFrame, keys: Sequence[str],
                salt: int = 8, how: str = "inner") -> DataFrame:
    """Skew-defeating equi-join: explode the small/right side ``salt``
    ways and scatter the large/left side across the replicas, so a hot
    key's rows land on ``salt`` different reducers instead of one.

    AQE's skew-join split handles MOST skew for free (and this repo
    leans on it), but AQE can only split a skewed partition AFTER the
    shuffle files exist — when one key alone overflows a single task's
    disk/memory while writing, or the join is a sort-merge whose skewed
    side must still sort one giant partition, pre-salting is the only
    lever. This is the classic manual fix, packaged: for the SUPPORTED
    join types results are IDENTICAL to the plain join (the salt
    columns never leave the operator).

    Supported ``how``: inner / left(_outer) / left_semi / left_anti —
    types where an unmatched RIGHT row produces no output row. Right/
    full outer joins are rejected: each unmatched right row exists
    ``salt`` times (once per exploded replica), so the output would
    carry salt-x duplicate null-padded rows (ADVICE r9). Right-side
    skew wants the mirrored construction (salt the right, explode the
    left), not this operator.

    Left side cost: one row-spread salt column — pmod(hash(row id),
    salt), NOT a hash of the join key (a key-derived salt would send a
    hot key's rows to ONE replica again, which is exactly the bug this
    operator exists to fix). Any left-salt assignment yields the
    identical join result (each left row meets the one right replica
    carrying its salt), so the row-id spread affects routing only, never
    output. Right side cost: ``salt``x replication — use it
    dim-against-fact (replicating a fact table ``salt``x would be the
    bug, not the fix). NULL keys match null-safely (broadcast_attach
    contract).

    Output column shape matches ``left.join(right, keys, how)``.
    """
    keys = list(keys)
    if not keys:
        raise ValueError("salted_join: need at least one key")
    if salt < 1:
        raise ValueError("salted_join: salt must be >= 1")
    allowed = {"inner", "left", "left_outer", "leftouter",
               "left_semi", "leftsemi", "left_anti", "leftanti"}
    if str(how).lower() not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} unsupported — unmatched right "
            f"rows would be replicated {salt}x by the salt explode "
            "(right/full outer need the mirrored construction)")
    lsalt = F.pmod(F.hash(F.monotonically_increasing_id()),
                   F.lit(int(salt)))
    l2 = left.withColumn("__salt", lsalt)
    r2 = right.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(int(salt) - 1))))
    r2 = r2.withColumnRenamed("__salt", "__r_salt")
    for k in keys:
        r2 = r2.withColumnRenamed(k, f"__r_{k}")
    cond = [l2[k].eqNullSafe(r2[f"__r_{k}"]) for k in keys]
    cond.append(l2["__salt"] == r2["__r_salt"])
    out = l2.join(r2, cond, how)
    return out.drop("__salt", "__r_salt",
                    *[f"__r_{k}" for k in keys])
