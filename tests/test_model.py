"""Pure-model unit tests (no Spark session needed).

Mirrors the reference's own inline tests: duration parse/format round-trips
(utils.rs:125-161), version-suffix parsing (registry.rs:303-315), timestamp
format expressions (observation.rs:99-117), the intended vector-type
semantics (model.rs:110-143 bug fixed), and the backfill cutoff stepping
(materialization.rs:234-289 asserts 3 hourly jobs for a 3-hour range).
"""

import datetime as dt

import pytest

from feathr_spark.materialization import BackfillTime
from feathr_spark.model import (
    FeatureType, ValueType, format_duration, parse_duration_ms,
    timestamp_col_expr,
)
from feathr_spark.registry.catalog import parse_version_suffix


@pytest.mark.parametrize("s,ms", [
    ("1d", 86_400_000),
    ("90d", 90 * 86_400_000),
    ("3h", 3 * 3_600_000),
    ("15m", 900_000),
    ("30s", 30_000),
    ("250ms", 250),
    ("1.5h", 5_400_000),
    ("2 hours", 7_200_000),
    # HOCON quirk: a bare number is MILLISECONDS (utils.rs:80-84)
    ("1500", 1500),
    (1500, 1500),
])
def test_duration_parse(s, ms):
    assert parse_duration_ms(s) == ms


@pytest.mark.parametrize("ms,out", [
    (86_400_000, "1d"), (3_600_000, "1h"), (60_000, "1m"),
    (1000, "1s"), (1500, "1500ms"),
])
def test_duration_format_roundtrip(ms, out):
    assert format_duration(ms) == out
    assert parse_duration_ms(format_duration(ms)) == ms


def test_duration_invalid():
    with pytest.raises(ValueError):
        parse_duration_ms("not-a-duration")


@pytest.mark.parametrize("name,base,version", [
    ("feat", "feat", None),
    ("feat:latest", "feat", None),
    ("feat:3", "feat", 3),
    ("ns:feat:2", "ns:feat", 2),
])
def test_version_suffix(name, base, version):
    assert parse_version_suffix(name) == (base, version)


def test_timestamp_exprs():
    assert "CAST(`t` AS TIMESTAMP)" == timestamp_col_expr("t", None)
    assert "BIGINT" in timestamp_col_expr("t", "epoch")
    assert "TIMESTAMP_MILLIS" in timestamp_col_expr("t", "epoch_millis")
    assert "TO_TIMESTAMP(`t`, 'yyyy-MM-dd HH:mm:ss')" == \
        timestamp_col_expr("t", "yyyy-MM-dd HH:mm:ss")


def test_vector_types_intended_semantics():
    """The reference's *_VECTOR constructors all set val_type=BOOL (evident
    copy-paste bug, model.rs:115,124,132,140); we implement the intended
    element types."""
    assert FeatureType.FLOAT_VECTOR().val_type == ValueType.FLOAT
    assert FeatureType.DOUBLE_VECTOR().val_type == ValueType.DOUBLE
    assert FeatureType.INT32_VECTOR().val_type == ValueType.INT32
    assert FeatureType.INT64_VECTOR().val_type == ValueType.INT64
    assert FeatureType.FLOAT_VECTOR().spark_ddl == "array<float>"


def test_backfill_three_hourly_jobs():
    """Reference materialization.rs:234-289: 3-hour range, HOURLY step →
    exactly 3 cutoffs, iterating backwards from end."""
    bt = BackfillTime(start=dt.datetime(2022, 1, 1, 0),
                      end=dt.datetime(2022, 1, 1, 3), step="HOURLY")
    assert bt.cutoffs() == [dt.datetime(2022, 1, 1, 3),
                            dt.datetime(2022, 1, 1, 2),
                            dt.datetime(2022, 1, 1, 1)]
