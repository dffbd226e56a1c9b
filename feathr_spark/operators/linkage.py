"""Record linkage: blocked edit-distance fuzzy matching.

Entity resolution by string similarity — the complement to the dedup
family's token/hash pipelines (MinHash, SimHash, winnowing) for SHORT
strings where a single typo breaks every shingle: names, titles, SKUs.
The reference has no matching operators at all; this is engine-side
because candidate generation must never be the all-pairs cross join.

Scale design: the classic blocking strategy — candidates come from an
ordinary equi join on block keys (AQE-splittable, never a nested
loop), with a cheap length-band predicate applied inside the join and
the exact Levenshtein verification (JVM builtin, codegen'd) only on
surviving candidates. Blocking trades recall for tractability; the
default union of PREFIX and SUFFIX blocks guarantees a match is kept
whenever the edits leave either end of the string untouched (any
single-typo pair always shares one of the two blocks when
``block_len <= min_len - max_dist``).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_match(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str = None,
    max_dist: int = 2,
    block_len: int = 3,
    left_id: str = None,
    right_id: str = None,
) -> DataFrame:
    """Pairs (left, right) whose strings are within Levenshtein
    distance ``max_dist``, found via prefix ∪ suffix blocking.

    Candidates = rows sharing the first ``block_len`` characters OR
    the last ``block_len`` characters (normalized: lowercased,
    whitespace-collapsed), pre-filtered by the length band
    ``|len_a − len_b| <= max_dist`` (a necessary condition for the
    distance bound), then verified with the exact edit distance.
    A true match escapes blocking only when edits touch BOTH ends of
    the string — the standard, documented blocking trade-off.

    For self-matching pass the same frame twice with an id column;
    pairs are then canonical (``id_l < id_r``, no self-pairs). NULL
    and shorter-than-``block_len`` strings are excluded (they block
    on nothing).

    Output: (id_l, id_r, <left_col>_l, <right_col>_r, dist).
    """
    if max_dist < 0 or block_len < 1:
        raise ValueError("fuzzy_match: bad max_dist/block_len")
    right_col = right_col or left_col
    left_id = left_id or "id"
    right_id = right_id or left_id
    self_match = left is right or (
        left_col == right_col and left.schema == right.schema
        and left.sameSemantics(right))

    def norm(c):
        return F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))

    def prep(df, col, idc, tag):
        s = norm(F.col(col))
        return (df.select(F.col(idc).alias(f"id_{tag}"),
                          s.alias(f"__s_{tag}"))
                .where(F.col(f"__s_{tag}").isNotNull()
                       & (F.length(f"__s_{tag}") >= int(block_len))))

    l = prep(left, left_col, left_id, "l")
    r = prep(right, right_col, right_id, "r")

    def blocked(key_fn, tag):
        lk = l.withColumn("__bk", key_fn(F.col("__s_l")))
        rk = r.withColumn("__bk", key_fn(F.col("__s_r")))
        cond = [lk.__bk == rk.__bk,
                F.abs(F.length(lk.__s_l) - F.length(rk.__s_r))
                <= int(max_dist)]
        if self_match:
            cond.append(lk.id_l < rk.id_r)
        return lk.join(rk, cond).select("id_l", "id_r",
                                        "__s_l", "__s_r")

    pre = lambda c: F.substring(c, 1, int(block_len))
    suf = lambda c: F.substring(c, -int(block_len), int(block_len))
    cands = blocked(pre, "p").unionByName(blocked(suf, "s")).distinct()
    dist = F.levenshtein(F.col("__s_l"), F.col("__s_r"))
    return (cands.withColumn("dist", dist)
            .where(F.col("dist") <= int(max_dist))
            .select("id_l", "id_r",
                    F.col("__s_l").alias(f"{left_col}_l"),
                    F.col("__s_r").alias(f"{right_col}_r"),
                    F.col("dist").cast("int").alias("dist")))
