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
