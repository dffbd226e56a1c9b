"""Property-based check of point-in-time window semantics.

Hypothesis generates small random event sets; the engine's PIT result is
compared against a brute-force pure-Python evaluation of the
(t − w, t] window definition (reference model.rs:254-293). Catches
boundary-inclusion, duplicate-timestamp, and empty-window regressions that
example-based tests can miss.
"""

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from feathr_spark import (
    Aggregation, DataFrameSource, Feature, FeatureAnchor, FeatureQuery,
    FeathrProject, ObservationSettings, TimeWindowParameters, TypedKey,
    WindowAggTransform,
)

BASE = dt.datetime(2024, 1, 1)

events = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),            # key
        st.integers(min_value=0, max_value=96),           # hour offset
        st.integers(min_value=-50, max_value=50),         # value (int: no fp fuzz)
    ),
    min_size=1, max_size=12,
)


def brute_force(rows, window_hours):
    """(key, t) -> dict of expected aggregates over (t-w, t]."""
    out = {}
    wms = window_hours * 3600
    for k, h, _ in rows:
        t = h * 3600
        in_win = [v for (k2, h2, v) in rows
                  if k2 == k and t - wms < h2 * 3600 <= t]
        latest_h = max((h2 for (k2, h2, v) in rows
                        if k2 == k and t - wms < h2 * 3600 <= t), default=None)
        out[(k, h)] = {
            "sum": float(sum(in_win)) if in_win else None,
            "cnt": len(in_win),
            "mx": float(max(in_win)) if in_win else None,
            "union": sorted(float(v) for v in in_win),
            # max_by semantics: value at the max timestamp (ties: engine
            # picks one; we keep only when unique at latest ts)
            "latest_ts": latest_h,
        }
    return out


@pytest.mark.usefixtures("spark")
@given(rows=events, window_hours=st.sampled_from([1, 5, 24, 48]))
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_window_semantics_match_brute_force(spark, rows, window_hours):
    df = spark.createDataFrame(
        [Row(k=k, t=BASE + dt.timedelta(hours=h), v=float(v))
         for k, h, v in rows]).dropDuplicates(["k", "t"])
    kept = {(r.k, int((r.t - BASE).total_seconds() // 3600)): r.v
            for r in df.collect()}
    rows = [(k, h, int(v)) for (k, h), v in kept.items()]

    p = FeathrProject("prop", spark)
    key = TypedKey(key_column="k")
    src = DataFrameSource(name="s", df=df, time_window_parameters=
                          TimeWindowParameters(timestamp_column="t"))
    p.register_anchor(FeatureAnchor(name="a", source=src, features=[
        Feature(name="f_sum", transform=WindowAggTransform(
            "v", Aggregation.SUM, f"{window_hours}h"), key=[key]),
        Feature(name="f_cnt", transform=WindowAggTransform(
            "v", Aggregation.COUNT, f"{window_hours}h"), key=[key]),
        Feature(name="f_max", transform=WindowAggTransform(
            "v", Aggregation.MAX, f"{window_hours}h"), key=[key]),
        Feature(name="f_union", transform=WindowAggTransform(
            "v", Aggregation.UNION, f"{window_hours}h"), key=[key]),
    ]))
    obs = ObservationSettings(timestamp_column="t")
    out = p.get_offline_features(
        obs.with_event_ts(df),
        FeatureQuery(["f_sum", "f_cnt", "f_max", "f_union"]))

    expected = brute_force(rows, window_hours)
    for r in out.collect():
        h = int((r.t - BASE).total_seconds() // 3600)
        e = expected[(r.k, h)]
        assert r.f_sum == e["sum"], (r, e)
        assert r.f_cnt == e["cnt"], (r, e)
        assert r.f_max == e["mx"], (r, e)
        assert sorted(r.f_union) == e["union"], (r, e)
