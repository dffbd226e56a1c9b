"""Reference-config ingestion: parse Feathr config payloads into runnable
:class:`FeathrProject` objects.

A migrating Feathr user's first action is "load my existing config". Three
entry points, one per payload shape the reference produces:

* :func:`from_feature_config` — the feature-definition config (IR #1)
  emitted by the reference client's ``get_feature_config``
  (/root/reference/feathr-rs/src/project.rs:321-325, serializer at
  374-437): ``anchors`` (group → key sqlExpr + source + features with
  untagged Expression/WindowAgg/Udf transformations, model.rs:248-276),
  ``derivations``, ``sources``. Accepts both the reference's camelCase
  serialization and this engine's :meth:`FeathrProject.to_feature_config`
  output (round-trip).
* :func:`from_join_config` — the join request (IR #2,
  project.rs:327-357 / observation.rs:50-97): ``observationPath`` +
  ``settings.joinTimeSettings.timestampColumn{def,format}`` +
  ``featureList`` + ``outputPath``.
* :func:`from_lineage` — the registry's Atlas-style lineage payload
  (``guidEntityMap`` + ``relations``; the shape of
  /root/reference/registry/test-data/sample.json), mirroring the
  reference's ``TryFrom<EntityLineage> for FeathrProjectImpl``
  (project.rs:742-846).

Python ``preprocessing`` source code embedded in lineage payloads is NOT
executed (arbitrary code); re-bind callables after load, as with
registry round-trips.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

from .feature import DerivedFeature, Feature, FeatureAnchor
from .model import (
    Aggregation, FeatureType, TensorCategory, TypedKey, UdfTransform,
    ValueType, VectorType, WindowAggTransform,
)
from .project import FeathrProject, FeatureQuery
from .source import (
    INPUT_CONTEXT, DataFrameSource, GenericSource, HdfsSource, JdbcSource,
    KafkaSource, ObservationSettings, Source, TimeWindowParameters,
)

# reference model.rs:12-30 — registry payloads store either the serde name
# or the ordinal as a string
_VALUE_TYPES = {
    "UNSPECIFIED": ValueType.UNSPECIFIED, "0": ValueType.UNSPECIFIED,
    "BOOLEAN": ValueType.BOOL, "BOOL": ValueType.BOOL, "1": ValueType.BOOL,
    "INT": ValueType.INT32, "INT32": ValueType.INT32, "2": ValueType.INT32,
    "LONG": ValueType.INT64, "INT64": ValueType.INT64, "3": ValueType.INT64,
    "FLOAT": ValueType.FLOAT, "4": ValueType.FLOAT,
    "DOUBLE": ValueType.DOUBLE, "5": ValueType.DOUBLE,
    "STRING": ValueType.STRING, "6": ValueType.STRING,
    "BYTES": ValueType.BYTES, "7": ValueType.BYTES,
}


def _value_type(v) -> ValueType:
    return _VALUE_TYPES.get(str(v).upper(), ValueType.UNSPECIFIED)


def _feature_type(d: Optional[dict]) -> FeatureType:
    if not d:
        return FeatureType()
    return FeatureType(
        type_=VectorType(d.get("type", "TENSOR")),
        tensor_category=TensorCategory(d.get("tensorCategory", "DENSE")),
        dimension_type=tuple(d.get("dimensionType", ())),
        val_type=_value_type(d.get("valType", "UNSPECIFIED")),
    )


def _typed_key(d: dict) -> TypedKey:
    return TypedKey(
        key_column=d["key_column"],
        key_column_type=_value_type(d.get("key_column_type", "UNSPECIFIED")),
        full_name=d.get("full_name"),
        description=d.get("description"),
        key_column_alias=d.get("key_column_alias"),
    )


def _keys_from_list(keys: Optional[Sequence[dict]]) -> tuple:
    """Key list from a registry payload; the dummy/NOT_NEEDED sentinel maps
    to an empty tuple (Feature defaults it back to DUMMY_KEY)."""
    if not keys:
        return ()
    parsed = [_typed_key(k) for k in keys
              if k.get("key_column") not in (None, "NOT_NEEDED")]
    return tuple(parsed)


def _transformation(d, keys: tuple = ()):
    """Untagged Transformation (reference model.rs:248-276 serde shapes +
    the registry's {transform_expr}/{def_expr, agg_func, ...} attributes)."""
    if isinstance(d, str):
        return d
    if "udf" in d:
        return UdfTransform(d["udf"])
    if set(d) == {"name"}:
        return UdfTransform(d["name"])
    agg = d.get("aggregation") or d.get("agg_func")
    if agg:
        expr = d.get("def", d.get("def_expr"))
        if isinstance(expr, dict):
            expr = expr["sqlExpr"]
        return WindowAggTransform(
            def_expr=expr,
            agg_func=Aggregation(agg),
            window=d.get("window") or "1d",
            group_by=d.get("group_by") or d.get("groupBy"),
            filter=d.get("filter"),
            limit=d.get("limit"),
            agg_param=d.get("agg_param") or d.get("aggParam"),
        )
    expr = d.get("def", d.get("definition", d.get("transform_expr")))
    if isinstance(expr, dict):
        expr = expr["sqlExpr"]
    if expr is None:
        raise ValueError(f"unrecognized transformation payload: {d!r}")
    return expr


def _source_from_config(name: str, d: dict) -> Source:
    """SourceImpl shape (reference source.rs:274-289: ``location`` +
    ``timeWindowParameters``) or this engine's ``source_to_dict`` shape."""
    if d.get("kind"):  # our own registry round-trip shape
        from .registry.roundtrip import source_from_dict
        return source_from_dict(d)
    twp = None
    twp_d = d.get("timeWindowParameters") or d.get("time_window_parameters")
    if twp_d:
        twp = TimeWindowParameters(
            timestamp_column=twp_d.get("timestampColumn",
                                       twp_d.get("timestamp_column")),
            timestamp_column_format=twp_d.get(
                "timestampColumnFormat", twp_d.get("timestamp_column_format")),
        )
    loc = d.get("location", d)
    if isinstance(loc, str):  # DataLocation::InputContext serializes bare
        return INPUT_CONTEXT
    if loc.get("type") in ("PASSTHROUGH", "INPUT_CONTEXT"):
        return INPUT_CONTEXT
    ltype = str(loc.get("type", "hdfs")).lower()
    if "url" in loc or ltype == "jdbc":
        auth = loc.get("auth") or "anonymous"
        if isinstance(auth, dict):  # JdbcAuth enum object → tag name
            auth = str(auth.get("type", next(iter(auth), "anonymous"))).lower()
        return JdbcSource(name=name, url=loc.get("url", ""),
                          dbtable=loc.get("dbtable"), query=loc.get("query"),
                          auth=auth, time_window_parameters=twp)
    if "brokers" in loc or ltype == "kafka":
        # KafkaSchema.avroJson (source.rs:48-54) is a STRING already
        # containing the Avro schema JSON — pass it through verbatim;
        # json.dumps only if someone stored it as a parsed object
        # (double-encoding a string breaks from_avro/compile_schema)
        schema = loc.get("schema")
        if isinstance(schema, dict):
            aj = schema.get("avroJson")
            avro_json = aj if isinstance(aj, str) or aj is None \
                else json.dumps(aj)
        else:
            avro_json = loc.get("avroJson")
        return KafkaSource(name=name, brokers=tuple(loc.get("brokers", ())),
                           topics=tuple(loc.get("topics", ())),
                           avro_schema_json=avro_json,
                           time_window_parameters=twp)
    if ltype == "generic" or ("format" in loc and "path" not in loc):
        return GenericSource(name=name, format=loc.get("format", "parquet"),
                             path=loc.get("path"),
                             options=dict(loc.get("options", {})),
                             time_window_parameters=twp)
    return HdfsSource(name=name, path=loc.get("path", ""),
                      format=loc.get("format"), time_window_parameters=twp)


def from_feature_config(cfg, spark=None,
                        name: str = "imported") -> FeathrProject:
    """Build a runnable project from a feature-definition config dict (or
    JSON string) in the reference's shape. Inverse of
    :meth:`FeathrProject.to_feature_config`."""
    if isinstance(cfg, str):
        cfg = json.loads(cfg)
    p = FeathrProject(name, spark)

    sources: Dict[str, Source] = {}
    for sname, sd in (cfg.get("sources") or {}).items():
        src = _source_from_config(sname, sd)
        sources[sname] = src
        p.register_source(src)

    feature_index: Dict[str, Feature] = {}
    for aname, ad in (cfg.get("anchors") or {}).items():
        sname = ad["source"]
        src = (INPUT_CONTEXT if sname in (INPUT_CONTEXT.name, "PASSTHROUGH")
               else sources[sname])
        key_aliases = [a for a in (ad.get("key", {}).get("sqlExpr") or ())
                       if a != "NOT_NEEDED"]
        keys = tuple(TypedKey(key_column=a) for a in key_aliases)
        feats = []
        for fname, fd in ad["features"].items():
            f = Feature(name=fname,
                        feature_type=_feature_type(fd.get("type")),
                        transform=_transformation(fd),
                        key=keys)
            feats.append(f)
            feature_index[fname] = f
        p.register_anchor(FeatureAnchor(name=aname, source=src,
                                        features=feats))

    derivations = cfg.get("derivations") or {}

    def input_names(dd: dict) -> List[str]:
        inputs = dd.get("inputs", ())
        if isinstance(inputs, dict):  # reference: {alias: {key, feature}}
            return [v["feature"] for v in inputs.values()]
        return list(inputs)

    registered: set = set()

    def add(dname: str):
        if dname in registered or dname not in derivations:
            return
        dd = derivations[dname]
        for dep in input_names(dd):
            if dep in derivations:
                add(dep)
        d = DerivedFeature(
            name=dname,
            feature_type=_feature_type(dd.get("type")),
            transform=_transformation(dd),
            input_features=[feature_index[n] for n in input_names(dd)],
            key=_keys_from_list(dd.get("key"))
            if dd.get("key") and isinstance(dd["key"][0], dict) else (),
        )
        p.register_derived(d)
        feature_index[dname] = d
        registered.add(dname)

    for dname in derivations:
        add(dname)
    return p


@dataclass(frozen=True)
class JoinRequest:
    """Parsed FeatureJoinConfig (reference project.rs:327-357)."""
    observation: ObservationSettings
    queries: tuple
    output_path: Optional[str] = None


def from_join_config(cfg) -> JoinRequest:
    """Parse a join request dict (or JSON string) in the reference's
    FeatureJoinConfig shape. Inverse of
    :meth:`FeathrProject.to_join_config`."""
    if isinstance(cfg, str):
        cfg = json.loads(cfg)
    ts = ((cfg.get("settings") or {}).get("joinTimeSettings") or {}) \
        .get("timestampColumn") or {}
    obs = ObservationSettings(
        observation_path=cfg.get("observationPath"),
        timestamp_column=ts.get("def"),
        timestamp_format=ts.get("format"),
    )
    def _key(q: dict):
        # the reference serializes the dummy key as the NOT_NEEDED sentinel
        # (feature.rs get_key_alias filters it on read — mirror that)
        cols = tuple(k for k in q.get("key", ()) if k != "NOT_NEEDED")
        return cols or None

    queries = tuple(
        FeatureQuery(q["featureList"], key=_key(q))
        for q in cfg.get("featureList", ())
    )
    return JoinRequest(observation=obs, queries=queries,
                       output_path=cfg.get("outputPath"))


# ---------------------------------------------------------------------------
# registry lineage payload (Atlas shape)
# ---------------------------------------------------------------------------

_WS, _SRC, _ANCHOR, _AF, _DF = (
    "feathr_workspace_v1", "feathr_source_v1", "feathr_anchor_v1",
    "feathr_anchor_feature_v1", "feathr_derived_feature_v1")


def _lineage_source(name: str, attrs: dict,
                    source_frames: Optional[dict]) -> Source:
    if attrs.get("type") == "PASSTHROUGH" or name == "PASSTHROUGH":
        return INPUT_CONTEXT
    twp = None
    if attrs.get("event_timestamp_column"):
        twp = TimeWindowParameters(
            timestamp_column=attrs["event_timestamp_column"],
            timestamp_column_format=attrs.get("timestamp_format"))
    if source_frames and name in source_frames:
        return DataFrameSource(name=name, df=source_frames[name],
                               time_window_parameters=twp)
    return HdfsSource(name=name, path=attrs.get("path", ""),
                      time_window_parameters=twp)


def from_lineage(payload, spark=None,
                 source_frames: Optional[dict] = None) -> FeathrProject:
    """Rebuild a runnable project from a registry lineage payload
    (``guidEntityMap`` + ``relations``), the shape the reference registry
    returns and that its client consumes in ``TryFrom<EntityLineage>``
    (project.rs:742-846). ``source_frames`` optionally re-binds named
    sources to in-memory DataFrames (remote paths in archived payloads are
    rarely reachable; embedded preprocessing code is never executed)."""
    if isinstance(payload, str):
        payload = json.loads(payload)
    ents: Dict[str, dict] = payload["guidEntityMap"]

    ws = next(e for e in ents.values() if e["typeName"] == _WS)
    project_name = ws["attributes"].get(
        "name", ws["attributes"].get("qualifiedName", "imported"))
    p = FeathrProject(project_name, spark)

    sources_by_guid: Dict[str, Source] = {}
    sources_by_qn: Dict[str, Source] = {}
    for guid, e in ents.items():
        if e["typeName"] != _SRC:
            continue
        a = e["attributes"]
        src = _lineage_source(a["name"], a, source_frames)
        sources_by_guid[guid] = src
        sources_by_qn[a["qualifiedName"]] = src
        if not src.is_input_context:
            p.register_source(src)

    def feature_from_entity(e: dict, keys_override=None) -> Feature:
        a = e["attributes"]
        return Feature(
            name=a["name"],
            feature_type=_feature_type(a.get("type")),
            transform=_transformation(a.get("transformation", {})),
            key=keys_override if keys_override is not None
            else _keys_from_list(a.get("key")),
        )

    feature_index: Dict[str, Feature] = {}
    for e in ents.values():
        if e["typeName"] != _ANCHOR:
            continue
        a = e["attributes"]
        sref = a.get("source") or {}
        src = (sources_by_guid.get(sref.get("guid"))
               or sources_by_qn.get(
                   (sref.get("uniqueAttributes") or {}).get("qualifiedName"))
               or INPUT_CONTEXT)
        feats = []
        for fref in a.get("features", ()):
            fe = ents[fref["guid"]]
            f = feature_from_entity(fe)
            feats.append(f)
            feature_index[f.name] = f
        p.register_anchor(FeatureAnchor(name=a["name"], source=src,
                                        features=feats))

    derived_entities = {e["attributes"]["name"]: e for e in ents.values()
                        if e["typeName"] == _DF}

    def derived_inputs(e: dict) -> List[str]:
        a = e["attributes"]
        names = []
        for ref in list(a.get("input_anchor_features", ())) + \
                list(a.get("input_derived_features", ())):
            names.append(ents[ref["guid"]]["attributes"]["name"])
        return names

    registered: set = set()

    def add(dname: str):
        if dname in registered:
            return
        e = derived_entities[dname]
        for dep in derived_inputs(e):
            if dep in derived_entities:
                add(dep)
        a = e["attributes"]
        p.register_derived(DerivedFeature(
            name=dname,
            feature_type=_feature_type(a.get("type")),
            transform=_transformation(a.get("transformation", {})),
            input_features=[feature_index[n] for n in derived_inputs(e)],
            key=_keys_from_list(a.get("key")),
        ))
        feature_index[dname] = p.derived[dname]
        registered.add(dname)

    for dname in derived_entities:
        add(dname)
    return p
