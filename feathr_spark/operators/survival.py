"""Survival analysis: the Kaplan-Meier product-limit estimator.

"How long until a customer orders again / a user churns / a job
fails?" with right-censoring (subjects still alive at observation end
contribute risk time but no event). The reference has no survival
operator; churn/retention modeling over event logs is a standard
analytics ask, and the estimator distributes cleanly:

1. ONE ``groupBy(duration)`` collapses the subject-sized input to the
   distinct-duration frame (events ``d_i`` and censored ``c_i`` per
   duration — map-side combined, so the shuffle carries one row per
   distinct duration per partition);
2. window cumsums over the tiny duration frame derive the at-risk
   counts ``n_i`` (total minus everyone who exited earlier);
3. the survival curve S(t) = prod_{t_i<=t} (1 - d_i/n_i) folds as
   ``exp(sum(log ...)))`` over the same ordered window.

The only full-data pass is step 1; everything after runs on a frame
whose size is the number of DISTINCT durations (days: thousands of
rows at any corpus scale). Per-key curves partition all three windows
by the key columns — same plan shape, one extra shuffle key.

A zero survival factor (every remaining subject exits at once,
1 - d/n = 0) would make ``log`` NULL in Spark (which returns NULL for
non-positive inputs, silently poisoning the running sum) and -inf in
DuckDB — so zero factors are counted separately and force S(t)=0 from
that duration on, keeping both engines exact and portable.
"""
from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def kaplan_meier(
    df: DataFrame,
    duration_col: str = "duration",
    event_col: str = "event",
    key_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Kaplan-Meier survival curve over ``(duration, event)`` rows —
    ``event`` truthy means the event was observed at ``duration``,
    falsy means the subject was censored there. NULL durations are
    dropped; NULL event flags count as censored (a subject whose
    outcome is unknown contributes risk time only, the conservative
    convention).

    Output: one row per distinct duration (per key group) with
    ``(duration, n_risk, n_event, n_censored, survival)``, survival
    rounded by the caller if hash-compared.
    """
    keys = list(key_cols or [])
    ev = F.when(F.col(event_col).cast("boolean"), 1).otherwise(0)
    per_t = (df.where(F.col(duration_col).isNotNull())
             .groupBy(*keys, F.col(duration_col).alias("duration"))
             .agg(F.sum(ev).alias("n_event"),
                  F.sum(1 - ev).alias("n_censored")))
    wcum = (Window.partitionBy(*keys).orderBy("duration")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wall = Window.partitionBy(*keys) if keys else \
        Window.partitionBy(F.lit(1))
    exited = F.col("n_event") + F.col("n_censored")
    n_risk = (F.sum(exited).over(wall)
              - F.sum(exited).over(wcum) + exited)
    t = per_t.withColumn("n_risk", n_risk)
    factor = 1.0 - F.col("n_event") / F.col("n_risk").cast("double")
    # log(0) is NULL in Spark / -inf in DuckDB: track zero factors as a
    # cumulative count instead and clamp survival to exactly 0 after one
    surv = F.when(
        F.sum(F.when(factor <= 0.0, 1).otherwise(0)).over(wcum) > 0,
        F.lit(0.0),
    ).otherwise(F.exp(F.sum(F.log(
        F.when(factor > 0.0, factor))).over(wcum)))
    return t.select(
        *keys, "duration",
        F.col("n_risk").cast("bigint").alias("n_risk"),
        F.col("n_event").cast("bigint").alias("n_event"),
        F.col("n_censored").cast("bigint").alias("n_censored"),
        surv.alias("survival"))


def logrank_test(
    df: DataFrame,
    duration_col: str = "duration",
    event_col: str = "event",
    group_col: str = "group",
) -> DataFrame:
    """Two-sample log-rank (Mantel-Cox) test: do two groups share a
    survival curve? The standard companion to :func:`kaplan_meier` —
    "does segment A churn faster than segment B" with right-censoring
    handled correctly (a plain mean-duration t-test is biased the
    moment anything is censored).

    At each distinct event time t (pooled over both groups), group A's
    observed events ``d_At`` are compared with the expectation under
    the null ``E_At = d_t · n_At / n_t`` (events split proportionally
    to the at-risk counts); the statistic is ``(Σ d_At − Σ E_At)² /
    Σ V_t`` with the hypergeometric variance ``V_t = d_t (n_At/n_t)
    (1 − n_At/n_t) (n_t − d_t)/(n_t − 1)`` — chi-squared with 1 dof
    under the null.

    Plan shape: ONE data-sized ``groupBy(group, duration)``; both
    groups' exit counts pivot into one row per distinct duration via
    conditional sums, at-risk counts derive from cumulative windows
    over that tiny frame (distinct-duration-sized — see
    :func:`kaplan_meier`), and the statistic is a final single-row
    aggregate. The two group labels are read with a LIMIT-3 collect
    (three scalars, a config-plane lookup — not a data collect).

    Output: one row — (group_a, group_b, n_a, n_b, obs_a, exp_a,
    obs_b, exp_b, chi2). Groups are ordered by label so the output is
    deterministic; raises if the column doesn't have exactly 2
    distinct non-NULL values.
    """
    ev = F.when(F.col(event_col).cast("boolean"), 1).otherwise(0)
    base = (df.where(F.col(duration_col).isNotNull()
                     & F.col(group_col).isNotNull())
            .select(F.col(group_col).alias("__g"),
                    F.col(duration_col).alias("__t"),
                    ev.alias("__e")))
    groups = [r[0] for r in
              base.select("__g").distinct().orderBy("__g").limit(3)
              .collect()]
    if len(groups) != 2:
        raise ValueError(
            f"logrank_test: need exactly 2 groups, saw {groups}")
    ga, gb = groups
    is_a = F.col("__g") == F.lit(ga)
    per_t = (base.groupBy("__t")
             .agg(F.sum(F.when(is_a, F.col("__e")).otherwise(0))
                  .alias("__da"),
                  F.sum(F.when(is_a, 1 - F.col("__e")).otherwise(0))
                  .alias("__ca"),
                  F.sum(F.when(~is_a, F.col("__e")).otherwise(0))
                  .alias("__db"),
                  F.sum(F.when(~is_a, 1 - F.col("__e")).otherwise(0))
                  .alias("__cb")))
    wcum = (Window.orderBy("__t")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wall = Window.partitionBy(F.lit(1))
    xa = F.col("__da") + F.col("__ca")
    xb = F.col("__db") + F.col("__cb")
    na = F.sum(xa).over(wall) - F.sum(xa).over(wcum) + xa
    nb = F.sum(xb).over(wall) - F.sum(xb).over(wcum) + xb
    t = (per_t.withColumn("__na", na).withColumn("__nb", nb)
         .where(F.col("__da") + F.col("__db") > 0))
    n = (F.col("__na") + F.col("__nb")).cast("double")
    d = (F.col("__da") + F.col("__db")).cast("double")
    pa = F.col("__na") / n
    e_a = d * pa
    v = F.when(n > 1.0,
               d * pa * (1.0 - pa) * (n - d) / (n - 1.0)).otherwise(0.0)
    agg = t.agg(
        F.sum("__da").cast("bigint").alias("obs_a"),
        F.sum(e_a).alias("exp_a"),
        F.sum("__db").cast("bigint").alias("obs_b"),
        F.sum(d - e_a).alias("exp_b"),
        F.sum(v).alias("__v"))
    n_tot = base.groupBy().agg(
        F.sum(F.when(is_a, 1).otherwise(0)).cast("bigint").alias("n_a"),
        F.sum(F.when(~is_a, 1).otherwise(0)).cast("bigint").alias("n_b"))
    chi2 = F.when(
        F.col("__v") > 0.0,
        (F.col("obs_a").cast("double") - F.col("exp_a")) ** 2
        / F.col("__v")).otherwise(0.0)
    return (agg.crossJoin(F.broadcast(n_tot))
            .select(F.lit(ga).alias("group_a"), F.lit(gb).alias("group_b"),
                    "n_a", "n_b", "obs_a", "exp_a", "obs_b", "exp_b",
                    chi2.alias("chi2")))


def order_gap_durations(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    horizon=None,
) -> DataFrame:
    """Turn an event/order log into right-censored re-occurrence gaps:
    each consecutive pair of a subject's timestamps yields an OBSERVED
    duration (days until the next event), and the gap from the last
    timestamp to ``horizon`` (default: the global max timestamp — the
    end of the observation window) yields a CENSORED duration.

    One ``lead`` window per subject plus a broadcast 1-row horizon
    frame; output is row-per-input-event, feeding ``kaplan_meier``.
    Output: (user, duration, event).
    """
    d = F.to_date(F.col(ts_col))
    base = (df.where(F.col(ts_col).isNotNull()
                     & F.col(user_col).isNotNull())
            .select(F.col(user_col).alias("user"), d.alias("__d")))
    if horizon is None:
        hz = base.agg(F.max("__d").alias("__hz"))  # 1-row, broadcast
        base = base.crossJoin(F.broadcast(hz))
    else:
        base = base.withColumn("__hz", F.lit(horizon).cast("date"))
    w = Window.partitionBy("user").orderBy("__d")
    nxt = F.lead("__d").over(w)
    return (base
            .select("user",
                    F.datediff(F.coalesce(nxt, F.col("__hz")), F.col("__d"))
                    .cast("bigint").alias("duration"),
                    nxt.isNotNull().alias("event")))


def nelson_aalen(
    df: DataFrame,
    duration_col: str = "duration",
    event_col: str = "event",
    key_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Nelson-Aalen cumulative hazard over ``(duration, event)`` rows —
    H(t) = Σ_{s<=t} d_s / n_s, with the Fleming-Harrington survival
    estimate exp(−H(t)) (the KM alternative that stays positive at full
    depletion and is the standard input to hazard-ratio eyeballing) and
    the standard variance estimate Σ d_s / n_s².

    Same censoring conventions and the same single
    (keys, duration)-aggregate + distinct-duration window algebra as
    :func:`kaplan_meier` — the cumulative sums run in window order, so
    both engines fold the identical sequence.

    Output per distinct duration (per key group): (duration, n_risk,
    n_event, cum_hazard, fh_survival, var_hazard).
    """
    keys = list(key_cols or [])
    ev = F.when(F.col(event_col).cast("boolean"), 1).otherwise(0)
    per_t = (df.where(F.col(duration_col).isNotNull())
             .groupBy(*keys, F.col(duration_col).alias("duration"))
             .agg(F.sum(ev).alias("n_event"),
                  F.sum(1 - ev).alias("n_censored")))
    wcum = (Window.partitionBy(*keys).orderBy("duration")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wall = Window.partitionBy(*keys) if keys else \
        Window.partitionBy(F.lit(1))
    exited = F.col("n_event") + F.col("n_censored")
    n_risk = (F.sum(exited).over(wall)
              - F.sum(exited).over(wcum) + exited)
    t = per_t.withColumn("n_risk", n_risk)
    nr = F.col("n_risk").cast("double")
    h = F.sum(F.col("n_event") / nr).over(wcum)
    v = F.sum(F.col("n_event") / (nr * nr)).over(wcum)
    return t.select(
        *keys, "duration",
        F.col("n_risk").cast("bigint").alias("n_risk"),
        F.col("n_event").cast("bigint").alias("n_event"),
        h.alias("cum_hazard"),
        F.exp(-h).alias("fh_survival"),
        v.alias("var_hazard"))
