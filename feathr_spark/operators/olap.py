"""Multi-level OLAP aggregation: GROUPING SETS / rollup / cube and pivot.

The reference engine's transformation DSL is raw Spark SQL
(``feathr-rs/src/model.rs:248-253``), so multi-level aggregates are part of
the query surface a reference user can express; here they are first-class
operators with a single-pass physical plan.

Scale design: ``grouping_sets_agg`` compiles to ONE ``Expand`` node feeding
ONE hash aggregate — every grouping level is computed in a single scan and a
single shuffle, instead of the naive N-scans-plus-union plan. ``Expand``
multiplies rows map-side (one replica per grouping set) but partial
aggregation collapses them before the exchange, so the shuffle volume is
bounded by the group cardinality, not the input size. ``pivot_agg`` takes the
pivot domain explicitly so no plan-time ``distinct().collect()`` scan of a
100 TB table is needed; the result is one ordinary hash aggregate with a
CASE-per-bucket projection (no per-value scans, no shuffle per column).
"""
from __future__ import annotations

from typing import Dict, List, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def grouping_sets_agg(
    df: DataFrame,
    group_sets: Sequence[Sequence[str]],
    aggs: Dict[str, str],
    all_label: str = "ALL",
) -> DataFrame:
    """Aggregate ``df`` at several grouping levels in ONE pass.

    ``group_sets`` is a list of column-name tuples — e.g.
    ``[("a", "b"), ("a",), ()]`` computes the detail level, the per-``a``
    subtotal and the grand total, exactly like SQL
    ``GROUP BY GROUPING SETS ((a, b), (a), ())``.

    ``aggs`` maps output alias -> aggregate SQL expression (plain ANSI SQL,
    e.g. ``{"n": "count(*)", "total": "sum(x)"}``).

    Every grouping column appears in the output as a STRING column where
    levels that do not group by it carry ``all_label``. The label is driven
    by ``GROUPING(col)`` — not by null-ness — so genuinely NULL group values
    survive as NULLs and cannot collide with the subtotal rows.
    """
    cols: List[str] = []
    for gs in group_sets:
        for c in gs:
            if c not in cols:
                cols.append(c)
    sets_sql = ", ".join("(" + ", ".join(gs) + ")" for gs in group_sets)
    proj = ", ".join(
        f"CASE WHEN grouping({c}) = 1 THEN '{all_label}' "
        f"ELSE CAST({c} AS STRING) END AS {c}"
        for c in cols
    )
    agg_sql = ", ".join(f"{expr} AS {alias}" for alias, expr in aggs.items())
    view = "__gsets_input"
    df.createOrReplaceTempView(view)
    return df.sparkSession.sql(
        f"SELECT {proj}, {agg_sql} FROM {view} "
        f"GROUP BY GROUPING SETS ({sets_sql})"
    )


def pivot_agg(
    df: DataFrame,
    key_cols: Sequence[str],
    pivot_col: str,
    value_col: str,
    values: Sequence[str],
    agg: str = "sum",
) -> DataFrame:
    """Pivot ``pivot_col`` into one aggregate column per value in ``values``.

    The pivot domain is explicit (``values``) so Spark skips the plan-time
    ``SELECT DISTINCT`` pass over the input — mandatory at 100 TB. Output
    columns are named ``{agg}_{value}``. Rows whose ``pivot_col`` is outside
    ``values`` contribute to no bucket; keys with no rows for a bucket get
    NULL (SQL semantics — use ``coalesce`` downstream for a zero-fill).
    """
    agg_fn = getattr(F, agg)
    pivoted = (
        df.groupBy(*[F.col(k) for k in key_cols])
        .pivot(pivot_col, list(values))
        .agg(agg_fn(F.col(value_col)))
    )
    renamed = pivoted
    for v in values:
        renamed = renamed.withColumnRenamed(v, f"{agg}_{v}")
    return renamed


def topk_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str,
    k: int,
    ascending: bool = False,
    tie_cols: Sequence[str] = (),
) -> DataFrame:
    """Generic top-``k`` rows per group by ``order_col`` (plus explicit
    ``tie_cols`` so the cut is deterministic when order values repeat).

    Formulated as a rank-filtered window so Spark's WindowGroupLimit
    pushes the per-group limit BELOW the shuffle: each map task keeps at
    most k rows per group before the exchange, so the shuffle volume is
    ``k * groups``, not the input size — the scalable group-wise top-k
    (asserted in the plan test). Adds ``rank_in_group`` (1-based).
    """
    from pyspark.sql import Window
    if k <= 0:
        raise ValueError("topk_per_group: k must be positive")
    oc = F.col(order_col).asc() if ascending else F.col(order_col).desc()
    order = [oc] + [F.col(c).asc() for c in tie_cols]
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (df.withColumn("rank_in_group", F.row_number().over(w))
            .where(F.col("rank_in_group") <= int(k))
            .withColumn("rank_in_group",
                        F.col("rank_in_group").cast("bigint")))


def mode_by(
    df: DataFrame,
    keys: Sequence[str],
    cat_col: str,
) -> DataFrame:
    """Per-group mode of a categorical column (ties break to the
    lexicographically smallest value — deterministic, engine-portable).

    Plan: the data-sized shuffle is the (keys, cat) count aggregate;
    the mode pick is a row_number window over the COUNT frame (group
    cardinality × category cardinality — tiny), so the raw data is
    scanned once and never window-sorted.

    Output: keys + (``mode``, mode_count, n).
    """
    counts = (df.where(F.col(cat_col).isNotNull())
              .groupBy(*keys, cat_col)
              .agg(F.count("*").alias("__c")))
    w = Window.partitionBy(*keys).orderBy(
        F.col("__c").desc(), F.col(cat_col).asc())
    tot = Window.partitionBy(*keys)
    return (counts
            .withColumn("__rn", F.row_number().over(w))
            .withColumn("__n", F.sum("__c").over(tot))
            .where(F.col("__rn") == 1)
            .select(*keys,
                    F.col(cat_col).alias("mode"),
                    F.col("__c").cast("bigint").alias("mode_count"),
                    F.col("__n").cast("bigint").alias("n")))


def skyline_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    minimize_x: bool = True,
    maximize_y: bool = True,
    n_buckets: int = 1024,
) -> DataFrame:
    """2-D Pareto frontier (skyline): rows not dominated by any other
    row, where q dominates p iff q is no worse on BOTH dimensions and
    strictly better on at least one. Default orientation: minimize x
    (e.g. price), maximize y (e.g. size/quality) — flip with the flags.

    The textbook NOT EXISTS formulation is an O(n²) self-join, and the
    obvious window form (running best-y ordered by x) is a GLOBAL sort
    over |distinct x| rows — data-sized when x is continuous. This is
    the fully distributed form; internally x/y are sign-normalized so
    "better" is always (smaller px, larger py):

    1. one data-sized aggregate collapses to a row per distinct px with
       the group's best py — the only shuffle that sees the input;
    2. px range-buckets into ``n_buckets`` equal spans from a broadcast
       1-row bounds frame; the strict-prefix best-py decomposes into
       (a) a per-BUCKET window (parallel across buckets, each sorts
       only its own span) and (b) a running best across the
       bucket-top frame — ``n_buckets`` rows, the only global window;
    3. a distinct-px row survives iff its best py beats
       max(same-bucket strict prefix, all-lower-buckets best); the
       surviving verdict joins back broadcast and keeps input rows
       matching their x's best y (ties on BOTH dims survive together —
       neither dominates the other).

    Total: one data-sized shuffle + one distinct-x-sized shuffle, no
    global sort, no self-join. Skyline size itself is unbounded
    (adversarially O(n)) but never materializes on one node.

    Output: the surviving input rows, unchanged schema.
    """
    px = F.col(x_col).cast("double") * (1.0 if minimize_x else -1.0)
    py = F.col(y_col).cast("double") * (1.0 if maximize_y else -1.0)
    per_x = df.select(px.alias("__px"), py.alias("__py")) \
        .groupBy("__px").agg(F.max("__py").alias("__best"))
    bounds = per_x.agg(F.min("__px").alias("__lo"),
                       F.max("__px").alias("__hi"))
    span = F.col("__hi") - F.col("__lo")
    bkt = F.when(span > 0,
                 F.least(F.floor((F.col("__px") - F.col("__lo")) / span
                                 * n_buckets),
                         F.lit(n_buckets - 1))).otherwise(F.lit(0)) \
        .cast("bigint")
    bucketed = per_x.crossJoin(F.broadcast(bounds)) \
        .select("__px", "__best", bkt.alias("__bkt"))
    w_local = Window.partitionBy("__bkt").orderBy(F.col("__px").asc()) \
        .rowsBetween(Window.unboundedPreceding, -1)
    tops = bucketed.groupBy("__bkt").agg(F.max("__best").alias("__top"))
    w_lower = Window.orderBy(F.col("__bkt").asc()) \
        .rowsBetween(Window.unboundedPreceding, -1)
    lower = tops.select("__bkt", F.max("__top").over(w_lower)
                        .alias("__lower"))
    prev = F.greatest(F.max("__best").over(w_local),
                      F.col("__lower"))  # greatest() skips NULL operands
    verdict = (bucketed
               .join(F.broadcast(lower), "__bkt")
               .withColumn("__prev", prev)
               .where(F.col("__prev").isNull()
                      | (F.col("__best") > F.col("__prev")))
               .select("__px", "__best"))
    return (df.join(F.broadcast(verdict),
                    (px == F.col("__px")) & (py == F.col("__best")))
            .select(*df.columns))


def pareto_contribution(
    df: DataFrame,
    key_col: str,
    value_col: str,
    target_share: float = 0.8,
    buckets: int = 64,
) -> DataFrame:
    """Pareto / contribution analysis: how many top keys cover
    ``target_share`` of the total? (the 80/20 audit for revenue
    concentration, corpus-source dominance, key-skew budgeting).

    Selection rule: keys are ranked by their aggregate value; the
    cutoff is the LARGEST per-key value v* whose at-or-above-v* share
    still reaches the target, and all keys tied at v* are included —
    deterministic at any parallelism, no arbitrary tie split.

    Plan: one per-key aggregate (DECIMAL-exact), collapse to the
    DISTINCT per-key-value frame, then the roc_auc-style bucketed
    prefix cumsum (range buckets + windows over the buckets-sized
    offset frame — no global sort); the cutoff and the final report
    are two folds over that distinct-value frame. Output: 1 row
    ``(n_keys, total, cutoff_value, top_keys, top_share,
    target_share)``.
    """
    if not 0 < target_share <= 1:
        raise ValueError("pareto_contribution: target_share in (0, 1]")
    per_key = (df.where(F.col(value_col).isNotNull())
               .groupBy(key_col)
               .agg(F.sum(F.col(value_col).cast("decimal(28,8)"))
                    .alias("__v")))
    # distinct per-key-value frame: how many keys share this exact value
    s = per_key.groupBy("__v").agg(F.count(F.lit(1)).alias("__k"))
    bounds = s.agg(F.min(F.col("__v").cast("double")).alias("__lo"),
                   F.max(F.col("__v").cast("double")).alias("__hi"),
                   F.sum(F.col("__v") * F.col("__k")).alias("__tot"),
                   F.sum("__k").alias("__nk"))
    sb = s.crossJoin(F.broadcast(bounds))
    lo, hi = F.col("__lo"), F.col("__hi")
    width = (hi - lo) / F.lit(int(buckets))
    bkt = (F.when(hi == lo, F.lit(0))
           .otherwise(F.least(
               F.floor((F.col("__v").cast("double") - lo) / width),
               F.lit(int(buckets) - 1)))).cast("bigint")
    sb = sb.select("__v", "__k", "__tot", "__nk", bkt.alias("__b"))
    bt = (sb.groupBy(F.lit(0).alias("__g"), "__b")
          .agg(F.sum(F.col("__v") * F.col("__k")).alias("__bs")))
    woff = (Window.partitionBy("__g").orderBy("__b")
            .rowsBetween(Window.unboundedPreceding, -1))
    offs = bt.select("__b", F.coalesce(
        F.sum("__bs").over(woff),
        F.lit(0).cast("decimal(38,8)")).alias("__off"))
    wrun = (Window.partitionBy("__b").orderBy("__v")
            .rowsBetween(Window.unboundedPreceding, -1))
    # share of total held by keys with value >= this row's value
    scored = (sb.join(F.broadcast(offs), "__b")
              .select("__v", "__k", "__tot", "__nk",
                      ((F.col("__tot")
                        - F.coalesce(F.sum(F.col("__v") * F.col("__k"))
                                     .over(wrun),
                                     F.lit(0).cast("decimal(38,8)"))
                        - F.col("__off")).cast("double")
                       / F.col("__tot").cast("double"))
                      .alias("__share_ge")))
    scored = scored.persist()
    cut = scored.where(F.col("__share_ge") >= target_share) \
        .agg(F.max("__v").alias("__cut"))
    rep = (scored.crossJoin(F.broadcast(cut))
           .where(F.col("__v") >= F.col("__cut"))
           .agg(F.first("__nk").alias("__nk"),
                F.first("__tot").alias("__tot"),
                F.first("__cut").alias("__c"),
                F.sum("__k").alias("__topk"),
                # share_ge decreases in v, so the share AT the cutoff
                # (= share of every included key) is the max
                F.max("__share_ge").alias("__tshare")))
    res = rep.select(
        F.col("__nk").cast("bigint").alias("n_keys"),
        F.col("__tot").cast("double").alias("total"),
        F.col("__c").cast("double").alias("cutoff_value"),
        F.col("__topk").cast("bigint").alias("top_keys"),
        F.col("__tshare").cast("double").alias("top_share"),
        F.lit(float(target_share)).alias("target_share"))
    from feathr_spark.operators._cache import attach_intermediates
    return attach_intermediates(res, (scored,))


def abc_xyz(
    df: DataFrame,
    key_col: str,
    value_col: str,
    period_col,
    a_cut: float = 0.80,
    b_cut: float = 0.95,
    x_cut: float = 0.50,
    y_cut: float = 1.00,
    buckets: int = 64,
) -> DataFrame:
    """ABC/XYZ inventory segmentation: each key gets an ABC class from
    its cumulative-from-top share of total value (A while the running
    share ≤ ``a_cut``, B while ≤ ``b_cut``, else C — the Pareto axis)
    and an XYZ class from the coefficient of variation of its
    per-period demand (X stable cv ≤ ``x_cut``, Y ≤ ``y_cut``, else Z —
    the predictability axis). The 9-cell grid drives stocking policy /
    curation priorities.

    Plan: one (key, period) aggregate, one per-key moment aggregate
    (DECIMAL-exact: total, n, Σv, Σv² of period sums), then the
    cumulative-from-top share via :func:`pareto_contribution`'s
    bucketed-prefix algebra over the DISTINCT per-key totals (range
    buckets + windows over bucket-sized frames — no global sort; ties
    all-inclusive, so equal totals always land in the same class at any
    parallelism). The per-key frame joins the distinct-value share
    frame on the exact DECIMAL total. Both class boundaries compare on
    6-dp-rounded statistics so the cut is engine-portable. ``period_col``
    may be a Column expression (e.g. ``date_trunc``).

    Output: ``(key, total_value, share_cum, abc, n_periods, cv, xyz)``.
    """
    per_kp = (df.where(F.col(value_col).isNotNull())
              .groupBy(F.col(key_col).alias("__key"),
                       (period_col if not isinstance(period_col, str)
                        else F.col(period_col)).alias("__p"))
              .agg(F.sum(F.col(value_col).cast("decimal(28,8)"))
                   .alias("__pv")))
    # persisted: the distinct-value share frame AND the final class
    # join both read it — without the cache the (key, period) shuffle
    # and the per-key moment aggregate would run twice
    per_key = (per_kp.groupBy("__key")
               .agg(F.sum("__pv").alias("__v"),
                    F.count(F.lit(1)).alias("__np"),
                    F.sum((F.col("__pv") * F.col("__pv"))
                          .cast("decimal(38,10)")).alias("__svv"))
               .persist())
    # distinct-total prefix shares (pareto_contribution's bucket plan)
    s = per_key.groupBy("__v").agg(F.count(F.lit(1)).alias("__k"))
    bounds = s.agg(F.min(F.col("__v").cast("double")).alias("__lo"),
                   F.max(F.col("__v").cast("double")).alias("__hi"),
                   F.sum(F.col("__v") * F.col("__k")).alias("__tot"))
    sb = s.crossJoin(F.broadcast(bounds))
    lo, hi = F.col("__lo"), F.col("__hi")
    width = (hi - lo) / F.lit(int(buckets))
    bkt = (F.when(hi == lo, F.lit(0))
           .otherwise(F.least(
               F.floor((F.col("__v").cast("double") - lo) / width),
               F.lit(int(buckets) - 1)))).cast("bigint")
    sb = sb.select("__v", "__k", "__tot", bkt.alias("__b"))
    bt = (sb.groupBy(F.lit(0).alias("__g"), "__b")
          .agg(F.sum(F.col("__v") * F.col("__k")).alias("__bs")))
    woff = (Window.partitionBy("__g").orderBy("__b")
            .rowsBetween(Window.unboundedPreceding, -1))
    offs = bt.select("__b", F.coalesce(
        F.sum("__bs").over(woff),
        F.lit(0).cast("decimal(38,8)")).alias("__off"))
    wrun = (Window.partitionBy("__b").orderBy("__v")
            .rowsBetween(Window.unboundedPreceding, -1))
    # cumulative-from-top share INCLUDING this value's full tie class
    shares = (sb.join(F.broadcast(offs), "__b")
              .select("__v",
                      ((F.col("__tot")
                        - F.coalesce(F.sum(F.col("__v") * F.col("__k"))
                                     .over(wrun),
                                     F.lit(0).cast("decimal(38,8)"))
                        - F.col("__off")).cast("double")
                       / F.col("__tot").cast("double"))
                      .alias("__share")))
    j = per_key.join(shares, "__v")
    n = F.col("__np").cast("double")
    sv = F.col("__v").cast("double")
    svv = F.col("__svv").cast("double")
    mean = sv / n
    var = F.when(n > 1, (svv - sv * sv / n) / (n - 1))
    cv = F.round(F.when((var >= 0) & (mean != 0), F.sqrt(var) / mean)
                 + F.lit(1e-9), 6)
    share_r = F.round(F.col("__share") + F.lit(1e-9), 6)
    abc = (F.when(share_r <= a_cut, "A")
           .when(share_r <= b_cut, "B").otherwise("C"))
    xyz = (F.when(cv.isNull(), "Z")
           .when(cv <= x_cut, "X")
           .when(cv <= y_cut, "Y").otherwise("Z"))
    res = j.select(
        F.col("__key").alias(key_col),
        F.col("__v").cast("double").alias("total_value"),
        share_r.cast("double").alias("share_cum"),
        abc.alias("abc"),
        F.col("__np").cast("bigint").alias("n_periods"),
        cv.cast("double").alias("cv"),
        xyz.alias("xyz"))
    from feathr_spark.operators._cache import attach_intermediates
    return attach_intermediates(res, (per_key,))


def price_indices(
    df: DataFrame,
    key_col: str,
    period_col,
    price_num_col: str,
    qty_col: str,
) -> DataFrame:
    """Laspeyres / Paasche / Fisher price indices per period against
    the EARLIEST period as base — the bitemporal price-level readout
    (inflation tracking, vendor-cost monitoring) every commerce
    warehouse eventually builds.

    Per (item, period): unit value p = Σ price-numerator / Σ qty and
    the quantity total q. Laspeyres_t = Σ p_t·q_0 / Σ p_0·q_0 (base
    basket), Paasche_t = Σ p_t·q_t / Σ p_0·q_t (current basket),
    Fisher = √(L·P). Only items PRESENT in the base period enter (the
    matched-sample convention — new items have no base price).

    Engine-portable arithmetic: unit values quantize to 6-dp doubles
    (one deterministic division), every cross term p·q rounds to 6 dp
    and accumulates as DECIMAL — the exact-sum discipline — and the
    final ratios are single double divisions. Plan: one (item, period)
    aggregate (the only data-sized shuffle), the 1-row base-period
    fold broadcast, the base frame re-joined per item (item-sized both
    sides), one period-level aggregate.
    """
    per = (df.where(F.col(qty_col).isNotNull()
                    & F.col(price_num_col).isNotNull())
           .groupBy(F.col(key_col).alias("__k"),
                    (period_col if not isinstance(period_col, str)
                     else F.col(period_col)).alias("__p"))
           .agg(F.sum(F.col(price_num_col).cast("decimal(28,8)"))
                .alias("__rev"),
                F.sum(F.col(qty_col).cast("decimal(18,2)"))
                .alias("__q")))
    per = per.where(F.col("__q") > 0).persist()
    unit = F.round(F.col("__rev").cast("double")
                   / F.col("__q").cast("double") + F.lit(1e-9), 6)
    pv = per.select("__k", "__p", unit.alias("__pr"),
                    F.col("__q").cast("double").alias("__qd"))
    base_p = per.agg(F.min("__p").alias("__p0"))
    base = (pv.join(F.broadcast(base_p), pv.__p == F.col("__p0"))
            .select(F.col("__k"),
                    F.col("__pr").alias("__pr0"),
                    F.col("__qd").alias("__q0")))
    j = pv.join(base, "__k")
    term = lambda a, b: F.sum(
        F.round(a * b + F.lit(1e-9), 6).cast("decimal(28,6)"))
    agg = (j.groupBy("__p")
           .agg(term(F.col("__pr"), F.col("__q0")).alias("__lt"),
                term(F.col("__pr0"), F.col("__q0")).alias("__lb"),
                term(F.col("__pr"), F.col("__qd")).alias("__pt"),
                term(F.col("__pr0"), F.col("__qd")).alias("__pb"),
                F.count(F.lit(1)).alias("__n")))
    las = F.when(F.col("__lb") != 0,
                 F.col("__lt").cast("double")
                 / F.col("__lb").cast("double"))
    paa = F.when(F.col("__pb") != 0,
                 F.col("__pt").cast("double")
                 / F.col("__pb").cast("double"))
    res = agg.select(
        F.col("__p").alias("period"),
        F.col("__n").cast("bigint").alias("n_items"),
        las.cast("double").alias("laspeyres"),
        paa.cast("double").alias("paasche"),
        F.when(las.isNotNull() & paa.isNotNull() & (las * paa >= 0),
               F.sqrt(las * paa)).cast("double").alias("fisher"))
    from feathr_spark.operators._cache import attach_intermediates
    return attach_intermediates(res, (per,))


def hhi(
    df: DataFrame,
    group_col: str,
    period_col,
    value_col: str,
) -> DataFrame:
    """Herfindahl–Hirschman concentration index per period: the sum of
    squared market shares over ``group_col`` (0 → atomized, 1 →
    monopoly; antitrust flags ~0.25) — the concentration trend readout
    for vendor/brand/source dependence.

    One (period, group) DECIMAL aggregate (the only data-sized
    shuffle); period totals join back period-cardinality-sized; each
    share is one deterministic double division quantized to 10 dp so
    the squared-share sum accumulates as DECIMAL (order-independent —
    a raw double Σshare² would vary with partitioning).

    Output: ``(period, n_groups, hhi)``.
    """
    # persisted: the period-totals aggregate and the share join both
    # read the (period, group) frame
    per = (df.where(F.col(value_col).isNotNull())
           .groupBy((period_col if not isinstance(period_col, str)
                     else F.col(period_col)).alias("period"),
                    F.col(group_col).alias("__g"))
           .agg(F.sum(F.col(value_col).cast("decimal(28,8)"))
                .alias("__v"))
           .persist())
    tot = per.groupBy("period").agg(F.sum("__v").alias("__t"))
    share = F.col("__v").cast("double") / F.col("__t").cast("double")
    term = F.round(share * share + F.lit(1e-12), 10) \
        .cast("decimal(18,10)")
    res = (per.join(F.broadcast(tot), "period")
           .groupBy("period")
           .agg(F.count(F.lit(1)).cast("bigint").alias("n_groups"),
                F.sum(term).cast("double").alias("hhi")))
    from feathr_spark.operators._cache import attach_intermediates
    return attach_intermediates(res, (per,))
