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

from pyspark.sql import DataFrame, Window
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


def drift_report(
    ref: DataFrame,
    cur: DataFrame,
    value_cols: Sequence[str],
    bins: int = 10,
    min_frac: float = 1e-6,
    summary: bool = False,
) -> DataFrame:
    """Distribution-drift report between a reference snapshot and a
    current one: per numeric column, compare the two frames' value
    distributions over a SHARED equal-width grid anchored on the
    reference frame's min/max, and score the shift with PSI (population
    stability index) terms. The monitoring companion to
    ``snapshot_diff`` — feature platforms alarm on exactly this when a
    refreshed materialization's feature distribution walks away from
    the training-time one (the reference ships snapshots blindly,
    ``feathr-rs/src/materialization.rs`` has no monitoring step).

    Binning (engine-portable, mirrors ``profile.histogram``): buckets
    0..bins-1 over [ref_min, ref_max] with a closed upper edge; bucket
    -1 = below ref_min, bucket ``bins`` = above ref_max (current-frame
    values can escape the reference range — that IS drift), bucket -2 =
    NULL. Fractions are over ALL rows of each side, so the full per-
    column distribution (nulls included) sums to 1 and null-rate drift
    is scored too. A constant reference column (min == max) puts every
    in-range value in bucket 0.

    ``psi_term = (cur_p - ref_p) * ln(cur_p / ref_p)`` with both
    proportions floored at ``min_frac`` (the standard zero-bin guard);
    PSI = sum of terms, conventional alert thresholds 0.1 / 0.25.

    Scale: each frame is scanned ONCE (columns melt into (column, v)
    rows in the projection); the bounds frame is n_cols rows and
    broadcasts; the bucket aggregation ships at most (n_cols *
    (bins+3)) rows per partition after partial aggregation; everything
    downstream is grid-sized. No driver collect.

    Output: (column, bucket, bucket_lo, bucket_hi, ref_frac, cur_frac,
    psi_term) — grid fully materialized, empty buckets at frac 0.
    With ``summary=True``: (column, psi, tv, null_shift) where ``tv``
    is total variation distance and ``null_shift`` = cur null frac -
    ref null frac.
    """
    if bins <= 0:
        raise ValueError("drift_report: bins must be positive")
    cols = list(value_cols)
    if not cols:
        raise ValueError("drift_report: no value_cols given")

    def melt(df: DataFrame) -> DataFrame:
        arr = F.array(*[F.struct(F.lit(c).alias("column"),
                                 F.col(c).cast("double").alias("v"))
                        for c in cols])
        return df.select(F.explode(arr).alias("m")) \
                 .select("m.column", "m.v")

    mref, mcur = melt(ref), melt(cur)
    # n_cols-row frame, but its subtree is a FULL reference scan — and it
    # fans out into three consumers (the bucketize broadcast + the grid).
    # Unpersisted, Spark re-runs the ref scan once per consumer (no
    # common-subplan sharing); persisted, the ref side is scanned exactly
    # twice total (bounds + bucket counts).
    bounds = mref.groupBy("column").agg(F.min("v").alias("__lo"),
                                        F.max("v").alias("__hi")).persist()

    # ONE bucket-count pass for BOTH sides: tag and union the melted
    # frames, bucketize against the broadcast bounds, and fold each
    # side's count with count_if — one data-sized aggregation (and one
    # scan per side) instead of two. Partial aggregation still caps the
    # shuffle at (n_cols * (bins+3)) rows per partition.
    m = (mref.select("column", "v", F.lit(True).alias("__is_ref"))
         .unionByName(mcur.select("column", "v",
                                  F.lit(False).alias("__is_ref"))))
    d = m.join(F.broadcast(bounds), "column")
    lo, hi, v = F.col("__lo"), F.col("__hi"), F.col("v")
    width = (hi - lo) / F.lit(int(bins))
    idx = (F.when(v.isNull(), F.lit(-2))
           .when(lo.isNull() | (v < lo), F.lit(-1))
           .when(v > hi, F.lit(bins))
           .when(hi == lo, F.lit(0))
           .otherwise(F.least(F.floor((v - lo) / width),
                              F.lit(int(bins) - 1))))
    counts = (d.select("column", idx.cast("bigint").alias("bucket"),
                       "__is_ref")
              .groupBy("column", "bucket")
              .agg(F.count_if(F.col("__is_ref")).alias("__rn"),
                   F.count_if(~F.col("__is_ref")).alias("__cn")))
    grid = bounds.select(
        "column", "__lo", "__hi",
        F.explode(F.sequence(F.lit(-2), F.lit(int(bins)))).alias("bucket"))
    # counts is grid-sized (<= n_cols * (bins+3) rows) — broadcast it so
    # the grid side never shuffles
    j = (grid.join(F.broadcast(counts), ["column", "bucket"], "left")
             .select("column", "bucket", "__lo", "__hi",
                     F.coalesce("__rn", F.lit(0)).alias("__rn"),
                     F.coalesce("__cn", F.lit(0)).alias("__cn")))
    # totals per (column, side): a window over the grid-sized frame
    wc = Window.partitionBy("column")
    rt, ct = F.sum("__rn").over(wc), F.sum("__cn").over(wc)
    ref_frac = F.when(rt > 0, F.col("__rn") / rt).otherwise(F.lit(0.0))
    cur_frac = F.when(ct > 0, F.col("__cn") / ct).otherwise(F.lit(0.0))
    width = (F.col("__hi") - F.col("__lo")) / F.lit(int(bins))
    in_range = (F.col("bucket") >= 0) & (F.col("bucket") < bins)
    pr = F.greatest(F.col("ref_frac"), F.lit(float(min_frac)))
    pc = F.greatest(F.col("cur_frac"), F.lit(float(min_frac)))
    detail = (j.select(
        "column", "bucket",
        F.when(in_range, F.col("__lo") + F.col("bucket") * width)
         .alias("bucket_lo"),
        F.when(in_range, F.col("__lo") + (F.col("bucket") + 1) * width)
         .alias("bucket_hi"),
        ref_frac.alias("ref_frac"), cur_frac.alias("cur_frac"))
        .withColumn("psi_term", (pc - pr) * F.log(pc / pr)))
    from ._cache import attach_intermediates
    if not summary:
        return attach_intermediates(detail, [bounds])
    return attach_intermediates(detail.groupBy("column").agg(
        F.sum("psi_term").alias("psi"),
        (F.sum(F.abs(F.col("cur_frac") - F.col("ref_frac"))) / 2)
        .alias("tv"),
        F.sum(F.when(F.col("bucket") == -2,
                     F.col("cur_frac") - F.col("ref_frac"))
              .otherwise(F.lit(0.0))).alias("null_shift")), [bounds])


def benford_digits(
    df: DataFrame,
    value_col: str,
    round_dp: int = 4,
) -> DataFrame:
    """First-significant-digit distribution of a positive numeric column
    vs Benford's law — the classic fabricated-data / unit-mix-change
    smell test for financial and telemetry columns (organically-grown
    magnitudes follow P(d) = log10(1 + 1/d); uniform or hand-entered
    data does not).

    The digit is pure row-local arithmetic (floor(v / 10^floor(log10 v))
    — no string round-trip), so the whole report is ONE map-side-combined
    aggregate to 9 rows; the chi-square contribution per digit lets the
    caller sum a readout statistic without a second pass. Non-positive
    and NULL values are excluded (Benford is defined on magnitudes).

    Output: (digit 1-9, n, freq, expected, chi2_term), one row per
    OBSERVED digit (absent digits = zero count; the chi2 sum over
    observed rows equals the full sum because missing digits contribute
    n·p_d — add it driver-side if a strict statistic is needed, or
    gate on per-digit |freq − expected| which is the usual practice).
    """
    v = F.col(value_col).cast("double")
    digit = F.floor(v / F.pow(F.lit(10.0), F.floor(F.log10(v)))) \
        .cast("bigint")
    counts = (df.where(v.isNotNull() & (v > 0))
              .select(digit.alias("digit"))
              .groupBy("digit").agg(F.count("*").alias("__c")))
    w = Window.partitionBy()
    n = F.sum("__c").over(w).cast("double")
    freq = F.col("__c") / n
    expected = F.log10(F.lit(1.0) + 1.0 / F.col("digit"))
    chi2_term = n * (freq - expected) * (freq - expected) / expected
    return (counts.select(
        "digit",
        F.col("__c").cast("bigint").alias("n"),
        F.round(freq, round_dp).cast("double").alias("freq"),
        F.round(expected, round_dp).cast("double").alias("expected"),
        F.round(chi2_term, round_dp).cast("double").alias("chi2_term")))


def k_anonymity(
    df: DataFrame,
    qi_cols: Sequence[str],
    k: int = 10,
    sensitive_col: Optional[str] = None,
    l_div: int = 2,
) -> DataFrame:
    """Re-identification risk audit over a quasi-identifier column set:
    a dataset is k-anonymous when every QI combination covers >= k
    rows. Optionally also checks l-diversity (each QI group sees >=
    ``l_div`` distinct values of ``sensitive_col`` — k-anonymity alone
    leaks when a small group is homogeneous in the sensitive column).

    The governance gate a training-data pipeline runs before releasing
    a slice that includes user-adjacent attributes (complements the
    row-level pii_redact pass).

    Plan: ONE (qi...) cell aggregate — the only data-sized shuffle —
    then a single fold over the group-count frame. Output: 1 row
    ``(n_rows, n_groups, min_group_size, k, violating_groups,
    rows_at_risk, risk_pct[, low_diversity_groups])``.
    """
    qi = list(qi_cols)
    if not qi:
        raise ValueError("k_anonymity: qi_cols must name >= 1 column")
    aggs = [F.count(F.lit(1)).alias("__c")]
    if sensitive_col is not None:
        aggs.append(F.countDistinct(F.col(sensitive_col)).alias("__s"))
    groups = df.groupBy(*qi).agg(*aggs)
    folds = [
        F.sum("__c").alias("__rows"),
        F.count(F.lit(1)).alias("__groups"),
        F.min("__c").alias("__min"),
        F.count_if(F.col("__c") < k).alias("__viol"),
        F.coalesce(F.sum(F.when(F.col("__c") < k, F.col("__c"))),
                   F.lit(0)).alias("__risk"),
    ]
    if sensitive_col is not None:
        folds.append(F.count_if(F.col("__s") < l_div).alias("__lowdiv"))
    out = groups.agg(*folds)
    cols = [
        F.col("__rows").cast("bigint").alias("n_rows"),
        F.col("__groups").cast("bigint").alias("n_groups"),
        F.col("__min").cast("bigint").alias("min_group_size"),
        F.lit(int(k)).cast("bigint").alias("k"),
        F.col("__viol").cast("bigint").alias("violating_groups"),
        F.col("__risk").cast("bigint").alias("rows_at_risk"),
        (F.col("__risk") / F.col("__rows")).cast("double")
        .alias("risk_pct"),
    ]
    if sensitive_col is not None:
        cols.append(F.col("__lowdiv").cast("bigint")
                    .alias("low_diversity_groups"))
    return out.select(*cols)


def fk_audit(
    child: DataFrame,
    child_key: str,
    parent: DataFrame,
    parent_key: str,
    edge: str = None,
) -> DataFrame:
    """Referential-integrity audit for one foreign-key edge: orphan
    child rows/keys (no matching parent), NULL keys, and parent
    coverage (fraction of parent keys actually referenced) — the
    relational contract check run before any PIT join is trusted.

    Plan: the child collapses to (key, row-count) in one map-side-
    combined aggregate, the parent to its distinct keys; ONE full-outer
    join of the two KEY-CARDINALITY-sized frames feeds a single fold.
    The fact table is scanned once and never joined row-level, so a
    skewed FK (one parent owning half the children) costs one partial-
    agg cell, not a hot join partition.

    Output (1 row): ``(edge, n_child_rows, n_null_keys,
    n_orphan_rows, n_orphan_keys, n_parent_keys, n_referenced_keys,
    referenced_frac, orphan_row_frac)``.
    """
    ck = (child.groupBy(F.col(child_key).alias("__k"))
          .agg(F.count(F.lit(1)).alias("__cn")))
    pk = (parent.select(F.col(parent_key).alias("__k"))
          .where(F.col("__k").isNotNull()).distinct()
          .withColumn("__p", F.lit(1)))
    j = ck.join(pk, "__k", "full_outer")
    child_side = F.col("__cn").isNotNull()
    key_null = child_side & F.col("__k").isNull()
    orphan = (child_side & F.col("__k").isNotNull()
              & F.col("__p").isNull())
    agg = j.agg(
        F.coalesce(F.sum(F.when(child_side, F.col("__cn"))), F.lit(0))
        .alias("__rows"),
        F.coalesce(F.sum(F.when(key_null, F.col("__cn"))), F.lit(0))
        .alias("__nulls"),
        F.coalesce(F.sum(F.when(orphan, F.col("__cn"))), F.lit(0))
        .alias("__orows"),
        F.count_if(orphan).alias("__okeys"),
        F.count_if(F.col("__p").isNotNull()).alias("__pkeys"),
        F.count_if(F.col("__p").isNotNull() & child_side)
        .alias("__refd"))
    rows = F.col("__rows").cast("double")
    return agg.select(
        F.lit(edge or f"{child_key}->{parent_key}").alias("edge"),
        F.col("__rows").cast("bigint").alias("n_child_rows"),
        F.col("__nulls").cast("bigint").alias("n_null_keys"),
        F.col("__orows").cast("bigint").alias("n_orphan_rows"),
        F.col("__okeys").cast("bigint").alias("n_orphan_keys"),
        F.col("__pkeys").cast("bigint").alias("n_parent_keys"),
        F.col("__refd").cast("bigint").alias("n_referenced_keys"),
        F.when(F.col("__pkeys") > 0,
               F.round(F.col("__refd").cast("double")
                       / F.col("__pkeys").cast("double") + F.lit(1e-9),
                       4)).cast("double").alias("referenced_frac"),
        F.when(rows > 0,
               F.round(F.col("__orows").cast("double") / rows
                       + F.lit(1e-9), 4)).cast("double")
        .alias("orphan_row_frac"))


def split_leakage(
    df: DataFrame,
    fractions: Dict[str, float],
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: Optional[str] = None,
    salt: str = "",
) -> DataFrame:
    """Cross-split duplicate-leakage audit: how many held-out documents
    have an EXACT duplicate (md5 of normalized text) inside the training
    split. A corpus deduplicated per-source can still leak across a
    random split whenever the same text appears under two ids — the
    classic eval-contamination failure a training pipeline must gate on
    BEFORE the split ships (the reference has no notion of splits; this
    belongs to the LLM-pipeline extension surface, same family as
    ``cross_corpus_containment``/bloom decontamination but INTERNAL to
    one corpus + one split assignment).

    The split is the engine-portable :func:`sampling.hash_split` (md5
    buckets — the audit reproduces the exact assignment the sampler
    ships). The FIRST name in ``fractions`` is the reference/"train"
    split; every other split is scored against it. With ``group_col``
    the counts break out per group (e.g. per source) as well as per
    split.

    Plan shape (scale): one distinct over the train fingerprints (keyed
    shuffle on the fingerprint; output bounded by distinct train texts)
    + one fingerprint-keyed LEFT join of the held-out rows against it —
    both exchanges hash on the same key, so AQE plans them as one
    co-partitioned pair — then a split-cardinality-sized aggregate.
    Nothing collects; duplicate-heavy fingerprints are exactly the skew
    AQE's join splitting absorbs.

    Output: (split [, group], n_docs, n_leaked, leak_rate), one row per
    non-reference split [x group].
    """
    from .dedup import normalize_text
    from .sampling import hash_split

    ref = next(iter(fractions))
    fp = F.md5(normalize_text(F.col(text_col)))
    keep = [F.col(group_col)] if group_col else []
    d = (hash_split(df, fractions, id_col=id_col, salt=salt)
         .select("split", fp.alias("__fp"), *keep))
    train_fp = (d.where(F.col("split") == ref)
                .select("__fp").distinct()
                .withColumn("__hit", F.lit(1)))
    held = d.where(F.col("split") != ref)
    j = held.join(train_fp, "__fp", "left")
    gb = ["split"] + ([group_col] if group_col else [])
    agg = (j.groupBy(*gb)
           .agg(F.count(F.lit(1)).alias("__n"),
                F.count("__hit").alias("__leak")))
    return agg.select(
        *gb,
        F.col("__n").cast("bigint").alias("n_docs"),
        F.col("__leak").cast("bigint").alias("n_leaked"),
        F.round(F.col("__leak").cast("double")
                / F.col("__n").cast("double") + F.lit(1e-9), 4)
        .cast("double").alias("leak_rate"))
