"""Reference-config ingestion tests.

Round-trip: emit this engine's reference-shaped configs, parse them back,
and prove the re-built project computes identical values. Lineage: load
the reference repo's actual registry payload
(/root/reference/registry/test-data/sample.json) and run its features
end-to-end on a synthetic taxi frame.
"""

import datetime as dt
import json

import pytest
from pyspark.sql import Row

from feathr_spark import (
    Aggregation, DataFrameSource, DerivedFeature, Feature, FeatureAnchor,
    FeatureQuery, FeathrProject, HdfsSource, INPUT_CONTEXT,
    ObservationSettings, TimeWindowParameters, TypedKey, WindowAggTransform,
)
from feathr_spark.configio import (
    from_feature_config, from_join_config, from_lineage,
)

SAMPLE = "/root/reference/registry/test-data/sample.json"


def ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture()
def canonical_project(spark, tmp_path):
    """The reference's canonical E2E shape (client.rs:310-502): passthrough
    exprs + keyed 90d window agg + derived ratio, over a parquet source."""
    rows = [Row(k=1 + i % 3, t=ts("2024-01-01") + dt.timedelta(hours=6 * i),
                v=float(10 + i)) for i in range(24)]
    path = str(tmp_path / "src.parquet")
    spark.createDataFrame(rows).write.mode("overwrite").parquet(path)

    p = FeathrProject("cfg_rt", spark)
    key = TypedKey(key_column="k")
    src = HdfsSource(name="src", path=path, time_window_parameters=
                     TimeWindowParameters(timestamp_column="t"))
    p.register_source(src)
    pt = FeatureAnchor(name="pt", source=INPUT_CONTEXT, features=[
        Feature(name="f_v2", transform="v * 2"),
        Feature(name="f_big", transform="cast_float(v) > 20"),
    ])
    w = FeatureAnchor(name="w", source=src, features=[
        Feature(name="f_avg_2d", transform=WindowAggTransform(
            "v", Aggregation.AVG, "2d"), key=[key]),
        Feature(name="f_cnt_2d", transform=WindowAggTransform(
            "v", Aggregation.COUNT, "2d", filter="v > 12"), key=[key]),
    ])
    p.register_anchor(pt)
    p.register_anchor(w)
    p.register_derived(DerivedFeature(
        name="f_ratio", transform="f_v2 / f_avg_2d",
        input_features=[pt.features[0], w.features[0]]))
    obs_df = spark.createDataFrame(rows)
    return p, obs_df


FEATS = ["f_v2", "f_big", "f_avg_2d", "f_cnt_2d", "f_ratio"]


def _run(project, obs_df):
    out = project.get_offline_features(
        ObservationSettings(timestamp_column="t").with_event_ts(obs_df),
        FeatureQuery(FEATS))
    return sorted([tuple(r) for r in out.select("k", "t", *FEATS).collect()],
                  key=repr)


def test_feature_config_round_trip(spark, canonical_project):
    p, obs_df = canonical_project
    cfg = p.to_feature_config()
    # parse back — through JSON to prove serializability
    p2 = from_feature_config(json.dumps(cfg), spark)
    assert set(p2.anchors) == {"pt", "w"}
    assert set(p2.derived) == {"f_ratio"}
    w2 = p2.anchors["w"]
    f_avg = next(f for f in w2.features if f.name == "f_avg_2d")
    assert isinstance(f_avg.transform, WindowAggTransform)
    assert f_avg.transform.agg_func == Aggregation.AVG
    assert f_avg.transform.window == "2d"
    assert f_avg.key_aliases == ("k",)
    f_cnt = next(f for f in w2.features if f.name == "f_cnt_2d")
    assert f_cnt.transform.filter == "v > 12"
    # identical answers from the original and the re-parsed project
    assert _run(p2, obs_df) == _run(p, obs_df)


def test_join_config_round_trip(spark, canonical_project):
    p, obs_df = canonical_project
    cfg = p.to_join_config(
        ObservationSettings(observation_path="/tmp/obs.parquet",
                            timestamp_column="t"),
        [FeatureQuery(FEATS)], "/tmp/out.parquet")
    req = from_join_config(json.dumps(cfg))
    assert req.observation.observation_path == "/tmp/obs.parquet"
    assert req.observation.timestamp_column == "t"
    assert req.output_path == "/tmp/out.parquet"
    assert req.queries[0].feature_list == tuple(FEATS)
    out = p.get_offline_features(
        req.observation.with_event_ts(obs_df), list(req.queries))
    assert out.count() == obs_df.count()


def test_lineage_sample_structure(spark):
    """The reference repo's actual lineage payload parses into the expected
    project graph (2 anchors, 4 passthrough + 2 windowed features, 3
    derived features in dependency order)."""
    p = from_lineage(open(SAMPLE).read(), spark)
    assert set(p.anchors) == {"request_features", "aggregationFeatures"}
    req = p.anchors["request_features"]
    assert req.source.is_input_context
    agg = p.anchors["aggregationFeatures"]
    assert agg.source.name == "nycTaxiBatchSource"
    assert agg.source.time_window_parameters.timestamp_column == \
        "lpep_dropoff_datetime"
    assert agg.source.time_window_parameters.timestamp_column_format == \
        "yyyy-MM-dd HH:mm:ss"
    fmax = next(f for f in agg.features if f.name == "f_location_max_fare")
    assert isinstance(fmax.transform, WindowAggTransform)
    assert fmax.transform.agg_func == Aggregation.MAX
    assert fmax.transform.window == "90d"
    assert fmax.key_aliases == ("DOLocationID",)
    assert set(p.derived) >= {"f_trip_time_distance", "f_trip_time_rounded"}
    # derived input resolution crossed entities correctly
    assert "f_trip_time_duration" in p.derived["f_trip_time_rounded"].input_names


def test_lineage_sample_runs_end_to_end(spark):
    """Load sample.json with the batch source re-bound to a synthetic taxi
    frame and compute passthrough + windowed + derived features."""
    taxi = spark.createDataFrame([
        Row(trip_distance=35.0, fare_amount=100.0, DOLocationID=7,
            lpep_pickup_datetime="2020-04-01 10:00:00",
            lpep_dropoff_datetime="2020-04-01 10:30:00"),
        Row(trip_distance=5.0, fare_amount=20.0, DOLocationID=7,
            lpep_pickup_datetime="2020-04-02 09:00:00",
            lpep_dropoff_datetime="2020-04-02 09:10:00"),
        Row(trip_distance=2.0, fare_amount=10.0, DOLocationID=9,
            lpep_pickup_datetime="2020-04-03 12:00:00",
            lpep_dropoff_datetime="2020-04-03 12:05:00"),
    ])
    p = from_lineage(open(SAMPLE).read(), spark,
                     source_frames={"nycTaxiBatchSource": taxi})
    obs = ObservationSettings(timestamp_column="lpep_dropoff_datetime",
                              timestamp_format="yyyy-MM-dd HH:mm:ss")
    out = p.get_offline_features(
        obs.with_event_ts(taxi),
        FeatureQuery(["f_is_long_trip_distance", "f_location_avg_fare",
                      "f_location_max_fare"]))
    got = {(r.DOLocationID, r.lpep_dropoff_datetime): r for r in out.collect()}
    r1 = got[(7, "2020-04-01 10:30:00")]
    assert r1.f_is_long_trip_distance is True     # 35 > 30
    assert r1.f_location_avg_fare == 100.0        # only itself in window
    r2 = got[(7, "2020-04-02 09:10:00")]
    assert r2.f_is_long_trip_distance is False
    assert r2.f_location_avg_fare == 60.0         # (100+20)/2, 90d window
    assert r2.f_location_max_fare == 100.0


def test_parameterized_agg_round_trip(spark, tmp_path):
    """agg_param-carrying aggregations (PERCENTILE fraction, DECAY half-
    life) must survive IR emit -> parse with values and enum intact."""
    import json
    df = spark.createDataFrame([Row(k=1, ts=ts("2024-01-01 00:00:00"),
                                    v=1.0)])
    path = str(tmp_path / "param_src.parquet")
    df.write.parquet(path)
    p = FeathrProject("pp", spark)
    src = HdfsSource(name="s", path=path,
                     time_window_parameters=TimeWindowParameters("ts"))
    key = [TypedKey(key_column="k")]
    p.register_anchor(FeatureAnchor(name="a", source=src, features=[
        Feature(name="p90", transform=WindowAggTransform(
            "v", Aggregation.PERCENTILE, "30d", agg_param=0.9), key=key),
        Feature(name="dsum", transform=WindowAggTransform(
            "v", Aggregation.DECAY_SUM, "30d", agg_param=7.0), key=key),
    ]))
    cfg = p.to_feature_config()
    p2 = from_feature_config(json.dumps(cfg), spark)
    feats = {f.name: f for a in p2.anchors.values() for f in a.features}
    assert feats["p90"].transform.agg_func == Aggregation.PERCENTILE
    assert feats["p90"].transform.agg_param == 0.9
    assert feats["dsum"].transform.agg_func == Aggregation.DECAY_SUM
    assert feats["dsum"].transform.agg_param == 7.0
