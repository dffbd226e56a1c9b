"""Categorical feature encoders for training-data pipelines.

The reference's feature DSL stops at Spark SQL expressions over source
columns (``/root/reference/feathr-rs/src/model.rs:248-253``); these are
the two encoders that expression vocabulary cannot reach — both need
corpus statistics (target encoding) or a portable hash contract
(feature hashing) — implemented engine-side with the repo's usual
discipline: decimal-exact statistics, broadcast-sized attach frames,
md5-based portability (no JVM-specific hash functions).

Scale shape: ``target_encode`` melts every encoded column into ONE
statistics pass (one data-sized shuffle however many columns), and the
per-category stats frames are category-cardinality-sized — they
broadcast back onto the data, which is scanned once more and never
shuffled. ``hash_encode`` is pure row-local projection: zero shuffle.
"""
from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def target_encode(
    df: DataFrame,
    cat_cols: Sequence[str],
    label_col: str,
    smoothing: float = 20.0,
    loo: bool = False,
    suffix: str = "_te",
    broadcast_stats: Optional[bool] = None,
) -> DataFrame:
    """Smoothed mean-target encoding of categorical columns: each
    category value maps to ``(sum_y + m·prior) / (n + m)`` where
    ``prior`` is the global label mean and ``m`` the smoothing pseudo-
    count — the standard high-cardinality categorical encoder (rare
    categories shrink toward the prior instead of memorizing noise).

    ``loo=True`` produces the leave-one-out variant for the TRAINING
    frame: each row's own label is excluded from its category's
    statistic (``(sum_y − y + m·prior) / (n − 1 + m)``), the standard
    target-leakage guard; encode serving/validation frames with
    ``loo=False`` stats.

    NULL categories encode to the prior (they carry no category
    evidence); NULL labels are excluded from all statistics and, under
    ``loo``, contribute nothing to subtract. Label must be boolean or
    numeric; sums are exact decimal (bit-stable, engine-portable).

    Plan: all columns melt into ONE (column, value) statistics pass —
    one data-sized shuffle total, not one per column; the global prior
    is a broadcast single-row frame and each per-category frame is
    category-cardinality-sized. ``broadcast_stats`` controls the attach
    join: ``None`` (default) adds no hint and lets Catalyst/AQE pick
    broadcast vs shuffle from the measured stats size — the safe choice
    for the high-cardinality categoricals this encoder targets, where a
    forced broadcast of a huge category frame can OOM the driver;
    ``True`` forces the broadcast hint (tiny known vocabularies);
    ``False`` never broadcasts. Adds ``{col}{suffix}`` per column.

    ``loo`` edge case: a singleton category with ``smoothing=0`` has an
    empty leave-one-out sample (``n − 1 + m = 0``); the row falls back
    to the prior (the no-evidence answer) instead of NULL-ing on the
    zero division.
    """
    cols = list(cat_cols)
    if not cols:
        raise ValueError("target_encode: cat_cols must be non-empty")
    m = float(smoothing)
    if m < 0:
        raise ValueError("target_encode: smoothing must be >= 0")
    y = F.col(label_col).cast("decimal(20,10)")

    # ONE stats pass over the melted (column, category, y) rows
    arr = F.array(*[F.struct(F.lit(c).alias("__c"),
                             F.col(c).cast("string").alias("__v"))
                    for c in cols])
    melted = (df.where(F.col(label_col).isNotNull())
              .select(y.alias("__y"), F.explode(arr).alias("m"))
              .select("__y", "m.__c", "m.__v")
              .where(F.col("__v").isNotNull()))
    stats = (melted.groupBy("__c", "__v")
             .agg(F.count("*").alias("__n"),
                  F.sum("__y").alias("__sy")))
    if len(cols) > 1:
        # each column's attach branch filters this frame — without a
        # persist Spark re-runs the whole melted aggregation per column
        # (same lesson as the dedup pair fan-out: no common-subplan
        # sharing across branches)
        stats = stats.persist()
    # exact decimal sum, ONE cast to double, then a double division —
    # decimal-division scale rules differ between engines, double math
    # on exact components does not
    prior = (df.where(F.col(label_col).isNotNull())
             .agg((F.sum(y).cast("double") / F.count(F.lit(1)))
                  .alias("__prior")))

    out = df.crossJoin(F.broadcast(prior))
    pr = F.col("__prior")
    for c in cols:
        st = (stats.where(F.col("__c") == c)
              .select(F.col("__v").alias(f"__v_{c}"),
                      F.col("__n").alias(f"__n_{c}"),
                      F.col("__sy").alias(f"__sy_{c}")))
        if broadcast_stats:
            st = F.broadcast(st)
        elif broadcast_stats is False:
            st = st.hint("shuffle_hash")
        out = out.join(st, out[c].cast("string") == st[f"__v_{c}"],
                       "left")
        n = F.col(f"__n_{c}").cast("double")
        sy = F.col(f"__sy_{c}").cast("double")
        if loo:
            yown = F.when(F.col(label_col).isNotNull(),
                          F.col(label_col).cast("double")) \
                .otherwise(F.lit(0.0))
            nown = F.when(F.col(label_col).isNotNull(), F.lit(1.0)) \
                .otherwise(F.lit(0.0))
            denom = n - nown + m
            # singleton category + smoothing=0 under loo: empty sample,
            # shrink fully to the prior instead of NULL on 0/0
            enc = F.when(denom <= 0, pr) \
                .otherwise((sy - yown + m * pr) / denom)
        else:
            enc = (sy + m * pr) / (n + m)
        out = out.withColumn(
            f"{c}{suffix}",
            F.when(F.col(f"__v_{c}").isNull(), pr).otherwise(enc)
            .cast("double"))
        out = out.drop(f"__v_{c}", f"__n_{c}", f"__sy_{c}")
    return out.drop("__prior")


def hash_encode(
    df: DataFrame,
    cols: Sequence[str],
    num_buckets: int = 1 << 18,
    salt: str = "",
    suffix: str = "_hx",
) -> DataFrame:
    """Feature hashing (the 'hashing trick'): map each categorical value
    to a stable integer bucket in ``[0, num_buckets)`` via md5 — the
    fixed-width encoder for unbounded vocabularies (no fitted mapping
    to store or ship, collisions accepted by design).

    Portable contract (same as the sampling/fingerprint family): bucket
    = first 15 hex digits of ``md5(salt ‖ column-name ‖ ':' ‖ value)``
    mod ``num_buckets`` — the column name salts the hash so the same
    value in two columns lands in decorrelated buckets. NULL values get
    a NULL bucket. Pure row-local projection, zero shuffle, bit-
    reproducible across engines and cluster sizes.

    Adds ``{col}{suffix}`` (bigint) per column.
    """
    cols = list(cols)
    if not cols:
        raise ValueError("hash_encode: cols must be non-empty")
    if num_buckets < 1:
        raise ValueError("hash_encode: num_buckets must be >= 1")
    out = df
    for c in cols:
        h = F.md5(F.concat(F.lit(salt), F.lit(c), F.lit(":"),
                           F.col(c).cast("string")))
        bucket = F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint") \
            % F.lit(int(num_buckets))
        out = out.withColumn(
            f"{c}{suffix}",
            F.when(F.col(c).isNotNull(), bucket).cast("bigint"))
    return out


def rfm_scores(
    orders: DataFrame,
    key_col: str,
    ts_col: str,
    amount_col: str,
    n_tiles: int = 5,
    method: str = "ntile",
) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation — the
    classic marketing-analytics feature triple, scored 1..``n_tiles``
    by ntile so every score level holds ~1/n of customers.

    Conventions: recency is days since the customer's last order
    relative to the NEWEST order in the frame (no wall-clock — exactly
    reproducible), scored so that MORE recent = HIGHER score, like
    frequency and monetary. Tile ordering is made deterministic by the
    (metric, key) composite sort, so equal metrics split by key —
    ntile needs a total order to be reproducible across engines.

    Plan: one data-sized aggregate to the per-key RFM triple; the
    1-row global max-date frame broadcasts; the three ntile windows run
    over the per-KEY frame (customer-sized, far below the order count).

    ``method``: ``"ntile"`` (default) is exact equal-frequency but its
    global ntile windows single-partition-sort the CUSTOMER frame —
    fine to ~10⁷ keys, the wrong plan at 10⁹. ``method="cuts"`` is the
    extreme-cardinality path: the interior percentile cut points of all
    three metrics come from :func:`stats.selection_percentiles`
    (bucket-histogram distributed selection — no task ever buffers the
    customer-metric multiset, unlike an ``F.percentile`` aggregate
    whose partial state is the full multiset merged in one reduce
    task), land as plan literals, and each key is scored by counting
    cuts strictly below its metric — zero windows, zero extra
    shuffles, so the customer frame never needs a total order. The
    cuts path is EAGER (the per-key aggregate materializes when this
    function is called, persisted across the selection passes). Tie
    semantics differ by design: equal metric values always share a
    score under ``cuts`` (the engine-portable rule), while ``ntile``
    splits them by key to hit exact 1/n class sizes. Output: key,
    recency_days, frequency, monetary, r_score, f_score, m_score,
    rfm (e.g. '545').
    """
    if method not in ("ntile", "cuts"):
        raise ValueError(f"rfm_scores: unknown method {method!r}")
    per_key = orders.groupBy(key_col).agg(
        F.max(F.col(ts_col).cast("timestamp")).alias("__last"),
        F.count("*").alias("frequency"),
        F.sum(F.col(amount_col).cast("decimal(28,8)")).alias("__m"))
    anchor = orders.agg(F.max(F.col(ts_col).cast("timestamp"))
                        .alias("__anchor"))
    base = per_key.crossJoin(F.broadcast(anchor)).select(
        F.col(key_col),
        F.datediff(F.col("__anchor"), F.col("__last"))
        .cast("bigint").alias("recency_days"),
        F.col("frequency").cast("bigint").alias("frequency"),
        F.col("__m").cast("double").alias("monetary"))
    if method == "cuts":
        from .stats import selection_percentiles
        fracs = [i / n_tiles for i in range(1, n_tiles)]
        base = base.persist()
        try:
            rc = selection_percentiles(base, "recency_days", fracs)
            fc = selection_percentiles(base, "frequency", fracs)
            mc = selection_percentiles(base, "monetary", fracs)
        finally:
            base.unpersist()

        def _below(col, cut_vals):
            # bucket = # cuts strictly below the value, the same
            # deterministic rule as scaling.quantile_bins; the cuts are
            # plan LITERALS (selection already ran), so scoring stays
            # fully codegen'd with no stats crossjoin at all. A None
            # cut only occurs on an empty frame (output empty anyway).
            x = F.col(col).cast("double")
            acc = F.lit(0)
            for c in cut_vals:
                acc = acc + F.when(
                    x > F.lit(0.0 if c is None else float(c)),
                    1).otherwise(0)
            return acc

        out = base.select(
            key_col, "recency_days", "frequency", "monetary",
            # small recency_days = recent = HIGH score
            (F.lit(n_tiles) - _below("recency_days", rc))
            .cast("bigint").alias("r_score"),
            (_below("frequency", fc) + 1).cast("bigint")
            .alias("f_score"),
            (_below("monetary", mc) + 1).cast("bigint")
            .alias("m_score"))
        return out.withColumn(
            "rfm", F.concat_ws("", F.col("r_score"), F.col("f_score"),
                               F.col("m_score")))
    r_w = Window.orderBy(F.col("recency_days").desc(), F.col(key_col))
    f_w = Window.orderBy(F.col("frequency").asc(), F.col(key_col))
    m_w = Window.orderBy(F.col("monetary").asc(), F.col(key_col))
    out = base.select(
        key_col, "recency_days", "frequency", "monetary",
        F.ntile(n_tiles).over(r_w).cast("bigint").alias("r_score"),
        F.ntile(n_tiles).over(f_w).cast("bigint").alias("f_score"),
        F.ntile(n_tiles).over(m_w).cast("bigint").alias("m_score"))
    return out.withColumn(
        "rfm", F.concat_ws("", F.col("r_score"), F.col("f_score"),
                           F.col("m_score")))


def woe_encode(
    df: DataFrame,
    cat_col: str,
    label_col: str,
    min_frac: float = 1e-4,
) -> DataFrame:
    """Weight-of-evidence table for a categorical feature against a
    binary label: per category ``woe = ln(pos_frac / neg_frac)`` (the
    credit-risk encode that linearizes categorical risk), plus each
    category's information-value term; ``sum(iv_term)`` over the table
    is the feature's IV (rule of thumb: < 0.02 useless, > 0.3 strong).

    ONE conditional aggregate collapses the data to the category frame
    (map-side combined — label counts per category, integer-exact);
    the positive/negative grand totals come back as a broadcast 1-row
    frame. Distribution fractions are floored at ``min_frac`` (the
    standard zero-cell guard, mirroring drift_report's PSI floor) so
    single-sided categories stay finite. NULL categories form their
    own row (NULL is a value in risk scoring); NULL labels are
    excluded.

    Degenerate corpora with zero positives (or zero negatives) overall
    have no meaningful class distribution to divide by: the affected
    fraction and the ``woe``/``iv_term`` columns come back NULL rather
    than letting the ``min_frac`` floor fabricate finite-looking values
    from a one-class fit.

    Output: ``(category, n, n_pos, n_neg, pos_frac, neg_frac, woe,
    iv_term)``.
    """
    y = F.col(label_col).cast("int")
    base = df.where(y.isin(0, 1))
    # persisted: the grand-total fold and the WoE projection both read
    # the category frame — without the cache the data-sized aggregate
    # scan would run twice
    per = (base.groupBy(F.col(cat_col).alias("category"))
           .agg(F.count(F.lit(1)).alias("__n"),
                F.sum(y).alias("__np"))
           .persist())
    tot = per.agg(F.sum("__np").alias("__tp"),
                  F.sum(F.col("__n") - F.col("__np")).alias("__tn"))
    j = per.crossJoin(F.broadcast(tot))
    nn = F.col("__n") - F.col("__np")
    # guard the grand totals: a zero total means a one-class corpus —
    # propagate NULL instead of letting greatest() swallow the NULL
    # division and floor it to a fake min_frac distribution
    pf = F.when(F.col("__tp") > 0,
                F.greatest(F.col("__np").cast("double")
                           / F.col("__tp").cast("double"),
                           F.lit(float(min_frac))))
    nf = F.when(F.col("__tn") > 0,
                F.greatest(nn.cast("double") / F.col("__tn").cast("double"),
                           F.lit(float(min_frac))))
    woe = F.log(pf / nf)
    res = j.select(
        "category",
        F.col("__n").cast("bigint").alias("n"),
        F.col("__np").cast("bigint").alias("n_pos"),
        nn.cast("bigint").alias("n_neg"),
        pf.cast("double").alias("pos_frac"),
        nf.cast("double").alias("neg_frac"),
        woe.cast("double").alias("woe"),
        ((pf - nf) * woe).cast("double").alias("iv_term"))
    from feathr_spark.operators._cache import attach_intermediates
    return attach_intermediates(res, (per,))
