"""FeathrClient facade tests: YAML config with the reference's env-var
override convention, project factory, registry-backed loading, job-status
vocabulary (client.rs:24-142, job_client/mod.rs:65-75, lib.rs surface).
"""

import os

import pytest
from pyspark.sql import Row

from feathr_spark import (
    DataFrameSource, FeathrClient, Feature, FeatureAnchor, FeatureQuery,
    FeathrProject, JobStatus, TypedKey,
)

CONFIG = """
api_version: 1
project_config:
  project_name: 'demo_project'
spark_config:
  spark_result_output_parts: '4'
offline_store:
  adls:
    adls_enabled: true
"""


def test_loads_config_and_env_override(monkeypatch):
    c = FeathrClient.loads(CONFIG)
    assert c.project_name == "demo_project"
    assert c.output_num_parts == 4
    assert c.get("offline_store", "adls", "adls_enabled") is True
    assert c.get("nope", "missing", default="d") == "d"
    # the reference's SECTION__KEY env override beats the file value
    monkeypatch.setenv("SPARK_CONFIG__SPARK_RESULT_OUTPUT_PARTS", "9")
    c2 = FeathrClient.loads(CONFIG)
    assert c2.output_num_parts == 9
    monkeypatch.setenv("PROJECT_CONFIG__PROJECT_NAME", "from_env")
    assert FeathrClient.loads(CONFIG).project_name == "from_env"


def test_load_from_file(tmp_path):
    p = tmp_path / "feathr_config.yaml"
    p.write_text(CONFIG)
    assert FeathrClient.load(str(p)).project_name == "demo_project"


def test_new_project_and_job_status(spark):
    c = FeathrClient.loads(CONFIG, spark=spark)
    p = c.new_project()
    assert isinstance(p, FeathrProject) and p.name == "demo_project"
    assert c.new_project("other").name == "other"
    jid = c.record_job()
    assert c.get_job_status(jid) is JobStatus.SUCCESS
    assert c.wait_for_job(jid).is_ended
    assert c.wait_for_jobs([jid]) == [JobStatus.SUCCESS]
    assert not JobStatus.RUNNING.is_ended
    with pytest.raises(KeyError):
        c.get_job_status(999)
    url = c.get_remote_url("some/local/file.conf")
    assert url.startswith("file:///") and url.endswith("some/local/file.conf")
    assert c.get_remote_url("s3a://bucket/x") == "s3a://bucket/x"


def test_registry_backed_load_project_runs(spark):
    """Full loop: build project -> save to registry -> client.load_project
    -> run a query on the reconstruction."""
    from feathr_spark.registry.catalog import Registry
    from feathr_spark.registry.roundtrip import save_project
    dims = spark.createDataFrame([Row(uid=1, score=0.5)])
    obs = spark.createDataFrame([Row(uid=1)])
    p = FeathrProject("cl", spark)
    p.register_anchor(FeatureAnchor(
        name="u", source=DataFrameSource(name="users", df=dims),
        features=[Feature(name="f_s", transform="score",
                          key=[TypedKey(key_column="uid")])]))
    reg = Registry()
    save_project(reg, p)
    c = FeathrClient.loads(CONFIG, spark=spark)
    p2 = c.load_project(reg, "cl")
    # DataFrame sources don't round-trip through the registry (no path);
    # re-register the frame, then the reconstructed definitions run
    p2.sources["users"] = DataFrameSource(name="users", df=dims)
    for a in p2.anchors.values():
        if a.source.name == "users":
            object.__setattr__(a, "source", p2.sources["users"])
    out = p2.get_offline_features(obs, FeatureQuery(["f_s"]))
    assert out.collect()[0].f_s == 0.5
