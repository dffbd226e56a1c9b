"""Layered configuration variable sources (the reference's VarSource).

Mirrors ``/root/reference/feathr-rs/src/var_source.rs``:

- ``EnvVarSource`` (var_source.rs:18-30): a path ``["a","b","c"]`` is
  looked up as the env var ``a__b__c`` and, failing that, ``A__B__C``
  (exact join first, then uppercased — the reference's ``or_else``).
- ``ProviderVarSource`` (var_source.rs:115-152 ``KeyVaultSource``): the
  reference asks Azure KeyVault for the secret named
  ``"__".join(path).upper()``. The cloud SDK is replaced by an
  injectable zero-dependency seam: any callable
  ``provider(secret_name) -> Optional[str]`` (a real deployment wires a
  KeyVault/SSM/Vault client here; tests wire a dict). A provider that
  returns ``None`` or raises is a miss, and the chain moves on — the
  same containment as the reference's ``KeyVaultSource::from_env().ok()``
  which degrades to yaml-only when KeyVault isn't configured.
- ``YamlVarSource`` (var_source.rs:52-113 ``YamlSource``): walks the
  parsed config mapping by path; a string leaf returns as-is, any other
  node returns its YAML serialization (var_source.rs:60-65).
- ``ChainVarSource``: first hit wins, in the REFERENCE'S lookup order
  (var_source.rs:100-112 ``YamlSource::get_environment_variable``):
  **env first, then the secret provider, then the yaml tree**. (Note:
  the env overlay outranks KeyVault in the reference's code — the env
  var is tried before ``kv_overlay``.)

``load_var_source`` / ``new_var_source`` mirror the reference's
module-level constructors (client.rs:133/145): build the full chain
from a config file / string plus an optional provider.
"""

from __future__ import annotations

import os
from typing import Callable, List, Optional, Sequence


class VarSource:
    """A place configuration values come from. ``get`` returns the
    value for a path like ``("online_store", "redis", "password")`` or
    ``None`` when this source has no answer (var_source.rs:14-16, with
    Err replaced by None so chaining is plain Python)."""

    def get(self, path: Sequence[str]) -> Optional[str]:
        raise NotImplementedError


def _joined(path: Sequence[str]) -> str:
    return "__".join(str(p) for p in path)


class EnvVarSource(VarSource):
    """var_source.rs:18-30: ``a__b__c`` then ``A__B__C``."""

    def get(self, path: Sequence[str]) -> Optional[str]:
        key = _joined(path)
        v = os.environ.get(key)
        if v is None:
            v = os.environ.get(key.upper())
        return v


class ProviderVarSource(VarSource):
    """The KeyVault seam (var_source.rs:115-152): secret name is the
    uppercased ``__``-joined path; misses and provider errors fall
    through to the next source."""

    def __init__(self, provider: Callable[[str], Optional[str]]):
        self._provider = provider

    def get(self, path: Sequence[str]) -> Optional[str]:
        try:
            return self._provider(_joined(path).upper())
        except Exception:
            return None


class YamlVarSource(VarSource):
    """var_source.rs:52-84: recursive mapping walk; string leaves
    return as-is, non-string nodes return their YAML serialization."""

    def __init__(self, root):
        self._root = root

    def get(self, path: Sequence[str]) -> Optional[str]:
        node = self._root
        for p in path:
            if not isinstance(node, dict) or p not in node:
                return None
            node = node[p]
        if node is None or isinstance(node, str):
            return node
        if isinstance(node, bool):
            return "true" if node else "false"   # YAML scalar form
        if not isinstance(node, (dict, list)):
            return str(node)                     # numeric scalars
        import yaml
        return yaml.safe_dump(node).strip()


class ChainVarSource(VarSource):
    """First-hit-wins over the reference's env → provider → yaml order
    (var_source.rs:100-112)."""

    def __init__(self, sources: List[VarSource]):
        self.sources = list(sources)

    def get(self, path: Sequence[str]) -> Optional[str]:
        for s in self.sources:
            v = s.get(path)
            if v is not None:
                return v
        return None


def new_var_source(config: Optional[dict],
                   provider: Optional[Callable[[str], Optional[str]]]
                   = None) -> ChainVarSource:
    """Build the full chain from a parsed config tree (client.rs:145
    ``new_var_source``). ``provider`` is the injectable KeyVault
    stand-in; omitted = the reference's unconfigured-KeyVault path
    (env → yaml only)."""
    sources: List[VarSource] = [EnvVarSource()]
    if provider is not None:
        sources.append(ProviderVarSource(provider))
    sources.append(YamlVarSource(config or {}))
    return ChainVarSource(sources)


def load_var_source(config_file: str,
                    provider: Optional[Callable[[str], Optional[str]]]
                    = None) -> ChainVarSource:
    """client.rs:133 ``load_var_source``: parse the YAML file, build
    the chain."""
    import yaml
    with open(config_file, "r", encoding="utf-8") as f:
        return new_var_source(yaml.safe_load(f) or {}, provider)
