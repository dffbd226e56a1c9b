"""Property-based checks for the late-round-6 operator families:
price-index homogeneity, Lorenz curve shape laws, Qini conservation,
WoE accounting identities — algebraic invariants that hold for EVERY
input, not just the worked examples."""
import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from feathr_spark.operators.encoding import woe_encode
from feathr_spark.operators.olap import price_indices
from feathr_spark.operators.scaling import lorenz_curve
from feathr_spark.operators.stats import qini_uplift

SETTINGS = dict(max_examples=8, deadline=None,
                suppress_health_check=[HealthCheck.function_scoped_fixture])


inventories = st.lists(
    st.tuples(st.integers(1, 50),                   # item (unique)
              st.integers(10, 1000),                # base qty (ints: exact)
              st.integers(1, 50)),                  # unit price
    min_size=3, max_size=12, unique_by=lambda t: t[0],
)


@settings(**SETTINGS)
@given(rows=inventories, c=st.sampled_from([2, 3, 5]))
def test_price_index_homogeneity(spark, rows, c):
    """If every item's unit price scales by exactly c between the base
    period and period 2 (quantities arbitrary), then Laspeyres,
    Paasche and Fisher all equal c — the defining axiom of a price
    index. Integer prices/quantities keep the check exact."""
    data = []
    for item, q, p in rows:
        data.append((item, 1, float(p * q), float(q)))        # base
        data.append((item, 2, float(c * p * (q + 3)), float(q + 3)))
    df = spark.createDataFrame(data, "k int, p int, rev double, q double")
    out = {r["period"]: r for r in
           price_indices(df, "k", "p", "rev", "q").collect()}
    # tolerance covers the 6-dp unit-value quantization inside the
    # operator (relative error ~1e-7 per term)
    assert abs(out[2]["laspeyres"] - c) < 1e-4
    assert abs(out[2]["paasche"] - c) < 1e-4
    assert abs(out[2]["fisher"] - c) < 1e-4
    assert abs(out[1]["fisher"] - 1.0) < 1e-4


values = st.lists(st.tuples(st.integers(0, 40), st.integers(1, 10_000)),
                  min_size=5, max_size=30, unique_by=lambda t: t[0])


@settings(**SETTINGS)
@given(rows=values)
def test_lorenz_shape_laws(spark, rows):
    """Any Lorenz curve: both cumulative fractions are nondecreasing in
    the bucket order, end exactly at (1, 1), and the value fraction
    never exceeds the population fraction (poorest-first ordering)."""
    df = spark.createDataFrame([(k, float(v)) for k, v in rows],
                               "k int, v double")
    out = sorted(lorenz_curve(df, "k", "v", buckets=5).collect(),
                 key=lambda r: r["bucket"])
    pops = [r["cum_pop_frac"] for r in out]
    vals = [r["cum_value_frac"] for r in out]
    assert all(b >= a - 1e-12 for a, b in zip(pops, pops[1:]))
    assert all(b >= a - 1e-12 for a, b in zip(vals, vals[1:]))
    assert abs(pops[-1] - 1.0) < 1e-9 and abs(vals[-1] - 1.0) < 1e-9
    # ascending-value buckets: cumulative value share lags population
    assert all(v <= p + 1e-9 for p, v in zip(pops, vals))
    assert sum(r["n_keys"] for r in out) == len(rows)


experiments = st.lists(
    st.tuples(st.integers(0, 1),                     # treat
              st.integers(0, 1),                     # outcome
              st.integers(0, 1000)),                 # score
    min_size=20, max_size=60,
)


@settings(**SETTINGS)
@given(rows=experiments)
def test_qini_full_depth_conservation(spark, rows):
    """At full depth the qini value must equal the OVERALL uplift times
    the whole population — bucketing cannot create or destroy
    incremental response; cum_n at the last row is the population."""
    nt = sum(1 for t, _, _ in rows if t)
    nc = len(rows) - nt
    if nt == 0 or nc == 0:
        return
    df = spark.createDataFrame(
        [(float(s), t, y) for t, y, s in rows],
        "score double, treat int, outcome int")
    out = sorted(qini_uplift(df, "treat", "outcome", "score", buckets=4)
                 .collect(), key=lambda r: r["bucket"])
    full = out[0]  # lowest bucket row carries the full-depth cumulants
    assert full["cum_n"] == len(rows)
    rt = sum(y for t, y, _ in rows if t)
    rc = sum(y for t, y, _ in rows if not t)
    expected = (rt / nt - rc / nc) * len(rows)
    assert abs(full["qini"] - expected) < 1e-6


labels = st.lists(st.tuples(st.sampled_from(["a", "b", "c"]),
                            st.integers(0, 1)),
                  min_size=8, max_size=40)


@settings(**SETTINGS)
@given(rows=labels)
def test_woe_accounting_identities(spark, rows):
    """Per-category counts must tile the dataset, and each category's
    WoE sign must match whether it is pos-enriched or pos-depleted
    relative to the global rate (when no fraction is floored)."""
    npos = sum(y for _, y in rows)
    nneg = len(rows) - npos
    if npos == 0 or nneg == 0:
        return
    df = spark.createDataFrame(rows, "c string, y int")
    out = woe_encode(df, "c", "y").collect()
    assert sum(r["n"] for r in out) == len(rows)
    assert sum(r["n_pos"] for r in out) == npos
    for r in out:
        if r["n_pos"] == 0 or r["n_neg"] == 0:
            continue  # floored fractions: sign still finite, skip
        enriched = r["n_pos"] / npos > r["n_neg"] / nneg
        if abs(r["pos_frac"] - r["neg_frac"]) > 1e-12:
            assert (r["woe"] > 0) == enriched, r


rollup_rows = st.lists(
    st.tuples(st.integers(0, 2),                    # key
              st.integers(0, 96),                   # hour offset
              st.integers(-500, 500)),              # value (int: exact)
    min_size=1, max_size=25,
)


@settings(**SETTINGS)
@given(rows=rollup_rows, split=st.integers(10, 90),
       split2=st.integers(10, 90))
def test_rollup_merge_equals_recompute_any_split(spark, rows, split,
                                                 split2):
    """merge(raw(A), raw(B), raw(C)) finalized must be IDENTICAL to the
    single-shot rollup for ANY 3-way split of the data — the
    continuous-aggregate refresh contract, not just at one cutoff.
    Integer values keep both paths bit-exact."""
    import datetime as dt
    from feathr_spark.operators.profile import (finalize_rollup,
                                                merge_rollups,
                                                time_rollup)
    base = dt.datetime(2024, 1, 1)
    data = [(k, base + dt.timedelta(hours=h), float(v))
            for k, h, v in rows]
    df = spark.createDataFrame(data, "k int, ts timestamp, v double")
    lo, hi = sorted((split, split2))
    parts = [df.where(f"hour(ts) + (day(ts)-1)*24 < {lo}"),
             df.where(f"hour(ts) + (day(ts)-1)*24 >= {lo} AND "
                      f"hour(ts) + (day(ts)-1)*24 < {hi}"),
             df.where(f"hour(ts) + (day(ts)-1)*24 >= {hi}")]
    raws = [time_rollup(p, "ts", ["k"], "v", levels=("hour",), raw=True)
            for p in parts]
    merged = {tuple(r)[:3]: tuple(r) for r in
              finalize_rollup(merge_rollups(*raws)).collect()}
    direct = {tuple(r)[:3]: tuple(r) for r in
              time_rollup(df, "ts", ["k"], "v",
                          levels=("hour",)).collect()}
    assert merged == direct
