"""VarSource chain tests (VERDICT r9 item 4): the reference's layered
credential/config resolution (feathr-rs/src/var_source.rs) — env var
``a__b__c``/``A__B__C`` first, then the injectable secret provider (the
KeyVault seam, secret name = uppercased ``__``-join), then the yaml
tree — wired through FeathrClient.get_var.
"""

import pytest

from feathr_spark.client import FeathrClient
from feathr_spark.varsource import (
    ChainVarSource, EnvVarSource, ProviderVarSource, YamlVarSource,
    load_var_source, new_var_source,
)

CFG = {
    "project_config": {"project_name": "demo"},
    "online_store": {
        "redis": {"host": "yaml-host", "port": 6379,
                  "password": "yaml-pass"},
    },
}


def test_env_exact_join_then_uppercase(monkeypatch):
    # var_source.rs:22-29: exact join first, uppercase fallback
    s = EnvVarSource()
    monkeypatch.setenv("ONLINE_STORE__REDIS__HOST", "upper-host")
    assert s.get(("online_store", "redis", "host")) == "upper-host"
    monkeypatch.setenv("online_store__redis__host", "exact-host")
    assert s.get(("online_store", "redis", "host")) == "exact-host"
    assert s.get(("no", "such", "key")) is None


def test_provider_naming_and_error_containment():
    seen = []

    def provider(name):
        seen.append(name)
        return {"ONLINE_STORE__REDIS__PASSWORD": "kv-pass"}.get(name)

    s = ProviderVarSource(provider)
    # var_source.rs:139-147: secret name is the uppercased __-join
    assert s.get(("online_store", "redis", "password")) == "kv-pass"
    assert seen == ["ONLINE_STORE__REDIS__PASSWORD"]
    assert s.get(("online_store", "redis", "host")) is None

    def boom(name):
        raise RuntimeError("vault unreachable")

    # a raising provider is a miss, not a crash (the reference degrades
    # the same way when KeyVault is unconfigured, var_source.rs:48/96)
    assert ProviderVarSource(boom).get(("a",)) is None


def test_yaml_walk_and_non_string_leaf():
    s = YamlVarSource(CFG)
    assert s.get(("online_store", "redis", "host")) == "yaml-host"
    # non-string leaf serializes (var_source.rs:60-65)
    assert s.get(("online_store", "redis", "port")) == "6379"
    # non-leaf node serializes as YAML
    assert "host: yaml-host" in s.get(("online_store", "redis"))
    assert s.get(("online_store", "mysql")) is None


def test_chain_precedence_env_provider_yaml(monkeypatch):
    # var_source.rs:100-112: env > provider > yaml (the env overlay is
    # tried BEFORE kv_overlay in the reference)
    provider = {"ONLINE_STORE__REDIS__PASSWORD": "kv-pass",
                "ONLINE_STORE__REDIS__HOST": "kv-host"}.get
    chain = new_var_source(CFG, provider)
    # yaml only
    assert chain.get(("project_config", "project_name")) == "demo"
    # provider beats yaml
    assert chain.get(("online_store", "redis", "password")) == "kv-pass"
    # without a provider: env -> yaml (unconfigured-KeyVault path)
    assert new_var_source(CFG).get(
        ("online_store", "redis", "password")) == "yaml-pass"
    # env beats provider (and yaml)
    monkeypatch.setenv("ONLINE_STORE__REDIS__PASSWORD", "env-pass")
    assert chain.get(("online_store", "redis", "password")) == "env-pass"
    assert new_var_source(CFG).get(
        ("online_store", "redis", "password")) == "env-pass"
    # total miss
    assert chain.get(("nope",)) is None
    assert isinstance(chain, ChainVarSource)


def test_load_var_source_from_file(tmp_path):
    f = tmp_path / "feathr_config.yaml"
    f.write_text("online_store:\n  redis:\n    host: file-host\n")
    chain = load_var_source(str(f))
    assert chain.get(("online_store", "redis", "host")) == "file-host"


def test_client_get_var_end_to_end(monkeypatch):
    provider = {"ONLINE_STORE__REDIS__PASSWORD": "kv-pass"}.get
    c = FeathrClient(CFG, secret_provider=provider)
    assert c.get_var("online_store", "redis", "host") == "yaml-host"
    assert c.get_var("online_store", "redis", "password") == "kv-pass"
    monkeypatch.setenv("ONLINE_STORE__REDIS__PASSWORD", "env-pass")
    assert c.get_var("online_store", "redis", "password") == "env-pass"
    assert c.get_var("missing", "key", default="dflt") == "dflt"
    # loads() wires the provider through, and structured get() still
    # returns the raw tree
    import yaml
    c2 = FeathrClient.loads(yaml.safe_dump(CFG),
                            secret_provider=provider)
    assert c2.get("online_store", "redis", "port") == 6379
    assert c2.get_var("online_store", "redis", "password") == "env-pass"
