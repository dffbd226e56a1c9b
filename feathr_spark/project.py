"""FeathrProject: feature registration + the query planner.

The reference compiles feature definitions into HOCON/JSON configs and
submits remote Spark jobs (/root/reference/feathr-rs/src/project.rs,
job_client/mod.rs). This engine is in-process: definitions are dataclasses
and ``get_offline_features`` plans and returns a *lazy* DataFrame — Catalyst
is the physical layer, there is no process boundary until ``.write``.

Planner responsibilities (SURVEY §4 — the only custom planning logic):
  * group features by (source, key-alias list) so one anchor group costs one
    source scan / one shuffle (scan+agg sharing, project.rs:374-437);
  * passthrough features are ``withColumn`` — no join;
  * non-windowed keyed anchors become left equi-joins (dimension semantics);
  * windowed anchors go through the point-in-time operator;
  * derived features are topologically ordered ``withColumn``s.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime
from typing import Callable, Dict, List, Optional, Sequence, Tuple, Union

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .feature import DerivedFeature, FeathrError, Feature, FeatureAnchor
from .functions import feathr_expr, register_feathr_functions
from .materialization import MaterializationSettings
from .model import ExpressionTransform, UdfTransform, WindowAggTransform
from .operators.point_in_time import WindowFeatureSpec, point_in_time_aggregate
from .source import EVENT_TS_COL, ObservationSettings, Source


@dataclass(frozen=True)
class FeatureQuery:
    """Requested features + the observation key columns to join them on
    (reference feature_query.rs:7-10). ``key`` positionally overrides each
    feature's own key aliases; None means use the aliases as-is."""
    feature_list: Tuple[str, ...]
    key: Optional[Tuple[str, ...]] = None

    def __post_init__(self):
        object.__setattr__(self, "feature_list", tuple(self.feature_list))
        if self.key is not None:
            object.__setattr__(self, "key", tuple(self.key))


class FeathrProject:
    """Container of sources, anchors and derived features
    (reference project.rs:28-30, 361-372)."""

    def __init__(self, name: str, spark: Optional[SparkSession] = None):
        self.name = name
        self.spark = spark
        self.sources: Dict[str, Source] = {}
        self.anchors: Dict[str, FeatureAnchor] = {}
        self.derived: Dict[str, DerivedFeature] = {}
        self.udfs: Dict[str, Callable] = {}
        self._feature_index: Dict[str, Tuple[FeatureAnchor, Feature]] = {}

    # ------------------------------------------------------------------
    # registration
    # ------------------------------------------------------------------
    def register_source(self, source: Source) -> Source:
        self.sources[source.name] = source
        return source

    def register_anchor(self, anchor: FeatureAnchor) -> FeatureAnchor:
        if anchor.name in self.anchors:
            raise FeathrError(f"duplicate anchor {anchor.name}")
        self.anchors[anchor.name] = anchor
        self.sources.setdefault(anchor.source.name, anchor.source)
        for f in anchor.features:
            if f.name in self._feature_index or f.name in self.derived:
                raise FeathrError(f"duplicate feature {f.name}")
            self._feature_index[f.name] = (anchor, f)
        return anchor

    def register_derived(self, d: DerivedFeature) -> DerivedFeature:
        if d.name in self.derived or d.name in self._feature_index:
            raise FeathrError(f"duplicate feature {d.name}")
        for inp in d.input_features:
            if inp.name not in self._feature_index and inp.name not in self.derived:
                raise FeathrError(f"derived {d.name}: unknown input {inp.name}")
        self.derived[d.name] = d
        return d

    def register_udf(self, name: str, fn: Callable) -> None:
        self.udfs[name] = fn

    # ------------------------------------------------------------------
    # introspection (reference python/src/lib.rs FeathrProject getters:
    # get_sources/get_source/get_anchor_groups/get_anchor_group/
    # get_anchor_features/get_derived_features/get_derived_feature/
    # get_input_context)
    # ------------------------------------------------------------------
    def get_sources(self) -> Dict[str, Source]:
        return dict(self.sources)

    def get_source(self, name: str) -> Source:
        try:
            return self.sources[name]
        except KeyError:
            raise FeathrError(f"unknown source {name}") from None

    def get_anchor_groups(self) -> Dict[str, FeatureAnchor]:
        return dict(self.anchors)

    def get_anchor_group(self, name: str) -> FeatureAnchor:
        try:
            return self.anchors[name]
        except KeyError:
            raise FeathrError(f"unknown anchor {name}") from None

    def get_anchor_features(self) -> List[str]:
        return list(self._feature_index)

    def get_derived_features(self) -> Dict[str, DerivedFeature]:
        return dict(self.derived)

    def get_derived_feature(self, name: str) -> DerivedFeature:
        try:
            return self.derived[name]
        except KeyError:
            raise FeathrError(f"unknown derived feature {name}") from None

    def get_input_context(self):
        from .source import INPUT_CONTEXT
        return INPUT_CONTEXT

    # ------------------------------------------------------------------
    # planning
    # ------------------------------------------------------------------
    def _resolve(self, names: Sequence[str]) -> Tuple[List[Tuple[FeatureAnchor, Feature]], List[DerivedFeature]]:
        """Expand requested names (+ transitive derived inputs) into anchor
        features and topologically-ordered derived features."""
        anchor_feats: Dict[str, Tuple[FeatureAnchor, Feature]] = {}
        derived_order: List[DerivedFeature] = []
        visiting: set = set()
        done: set = set()

        def visit(n: str):
            if n in done:
                return
            if n in visiting:
                raise FeathrError(f"cycle in derived features at {n}")
            visiting.add(n)
            if n in self.derived:
                d = self.derived[n]
                for inp in d.input_names:
                    visit(inp)
                derived_order.append(d)
            elif n in self._feature_index:
                anchor_feats[n] = self._feature_index[n]
            else:
                raise FeathrError(f"unknown feature {n}")
            visiting.discard(n)
            done.add(n)

        for n in names:
            visit(n)
        return list(anchor_feats.values()), derived_order

    def get_offline_features(
        self,
        observation: Union[DataFrame, ObservationSettings],
        feature_query: Union[FeatureQuery, Sequence[FeatureQuery]],
        observation_settings: Optional[ObservationSettings] = None,
        spark: Optional[SparkSession] = None,
        time_prune: bool = False,
        pit_strategy: str = "auto",
    ) -> DataFrame:
        """Point-in-time-correct LEFT feature join onto the observation
        frame (reference project.rs:248-278). Returns a lazy DataFrame.

        ``time_prune=True`` eagerly computes the observation's event-time
        bounds (one tiny aggregate job) and restricts every windowed
        source scan to ``[min_obs_ts − max_window, max_obs_ts]`` — at
        scale this reaches parquet row-group/partition pruning (SURVEY §4
        'partition pruning by time'). Leave False when observation ≈
        source (self-join shape) where it prunes nothing.

        ``pit_strategy`` selects the windowed-feature physical plan:
        ``"auto"`` (default — samples the source key distribution and
        switches to the skew-tolerant plan when one key dominates),
        ``"union_window"`` (one shuffle+sort, no row explosion) or
        ``"interval_join"`` (AQE-skew-splittable; pick when one entity
        key dominates the source). See operators.point_in_time.

        Note: with ``pit_strategy="auto"`` and windowed features present,
        planning runs one small eager Spark job (a column-pruned,
        row-limited key-skew sample, memoized per source plan) before the
        lazy result DataFrame is returned. Pass an explicit strategy to
        keep planning fully lazy.
        """
        self._time_prune = time_prune
        self._pit_strategy = pit_strategy
        spark = spark or self.spark
        if isinstance(observation, ObservationSettings):
            observation_settings = observation
            obs_df = observation.load(spark)
        else:
            obs_df = observation
        if observation_settings is not None:
            obs_df = observation_settings.with_event_ts(obs_df)
        if spark is None:
            spark = obs_df.sparkSession
        register_feathr_functions(spark)

        queries = [feature_query] if isinstance(feature_query, FeatureQuery) else list(feature_query)
        out = obs_df
        for q in queries:
            out = self._apply_query(spark, out, q)
        return out.drop(EVENT_TS_COL)

    def _apply_query(self, spark: SparkSession, obs: DataFrame, q: FeatureQuery) -> DataFrame:
        anchor_feats, derived_order = self._resolve(q.feature_list)

        def obs_keys_for(f: Feature) -> List[str]:
            aliases = list(f.key_aliases)
            if q.key is not None:
                if len(q.key) != len(aliases):
                    raise FeathrError(
                        f"{f.name}: query key arity {len(q.key)} != feature key arity {len(aliases)}")
                return list(q.key)
            return aliases

        # ---- passthrough (INPUT_CONTEXT) features: plain column exprs ----
        out = obs
        for anchor, f in anchor_feats:
            if not anchor.is_passthrough:
                continue
            out = self._attach_expression(out, f)

        # ---- group keyed features by (source, key columns, windowed?) ----
        joins: Dict[Tuple, List[Tuple[FeatureAnchor, Feature]]] = {}
        windows: Dict[Tuple, List[Tuple[FeatureAnchor, Feature]]] = {}
        for anchor, f in anchor_feats:
            if anchor.is_passthrough:
                continue
            gkey = (anchor.source.name,
                    tuple(k.key_column for k in f.key),
                    tuple(obs_keys_for(f)))
            (windows if f.is_windowed else joins).setdefault(gkey, []).append((anchor, f))

        for (src_name, src_keys, obs_keys), feats in joins.items():
            out = self._attach_keyed_join(spark, out, src_keys, obs_keys, feats)

        for (src_name, src_keys, obs_keys), feats in windows.items():
            out = self._attach_windowed(spark, out, src_keys, obs_keys, feats)

        # ---- derived features: topo-ordered column expressions ----
        for d in derived_order:
            assert isinstance(d.transform, ExpressionTransform)
            out = out.withColumn(d.name, feathr_expr(d.transform.sql_expr))
        return out

    def _attach_expression(self, df: DataFrame, f: Feature) -> DataFrame:
        t = f.transform
        if isinstance(t, ExpressionTransform):
            return df.withColumn(f.name, feathr_expr(t.sql_expr))
        if isinstance(t, UdfTransform):
            fn = self.udfs.get(t.name)
            if fn is None:
                raise FeathrError(f"{f.name}: UDF {t.name} not registered")
            return fn(df, f.name)
        raise FeathrError(f"{f.name}: unsupported passthrough transform {t}")

    def _attach_keyed_join(self, spark: SparkSession, obs: DataFrame,
                           src_keys: Sequence[str], obs_keys: Sequence[str],
                           feats: List[Tuple[FeatureAnchor, Feature]]) -> DataFrame:
        """Non-windowed keyed anchor: dimension-table semantics — project the
        source to (keys, feature exprs) and LEFT-join on the (aliased) keys.
        One scan serves every feature of the group. Spark/AQE picks
        broadcast vs shuffled join from size estimates."""
        anchor = feats[0][0]
        src_df = anchor.source.load(spark)
        cols = [F.col(sk).alias(ok) for sk, ok in zip(src_keys, obs_keys)]
        for _, f in feats:
            assert isinstance(f.transform, ExpressionTransform)
            cols.append(feathr_expr(f.transform.sql_expr).alias(f.name))
        feature_df = src_df.select(*cols)
        if anchor.broadcast_hint:
            feature_df = F.broadcast(feature_df)
        return obs.join(feature_df, on=list(obs_keys), how="left")

    def _attach_windowed(self, spark: SparkSession, obs: DataFrame,
                         src_keys: Sequence[str], obs_keys: Sequence[str],
                         feats: List[Tuple[FeatureAnchor, Feature]]) -> DataFrame:
        if EVENT_TS_COL not in obs.columns:
            raise FeathrError(
                "windowed features require observation timestamp settings "
                "(ObservationSettings.timestamp_column)")
        anchor = feats[0][0]
        src_df = anchor.source.load(spark)
        specs = [WindowFeatureSpec(out_name=f.name, transform=f.transform)
                 for _, f in feats]
        if getattr(self, "_time_prune", False):
            bounds = obs.select(
                F.unix_millis(F.min(EVENT_TS_COL).cast("timestamp")).alias("lo"),
                F.unix_millis(F.max(EVENT_TS_COL).cast("timestamp")).alias("hi"),
            ).first()
            if bounds and bounds.lo is not None:
                max_w = max(f.transform.window_ms for _, f in feats)
                lo_ms, hi_ms = bounds.lo - max_w, bounds.hi
                twp = anchor.source.time_window_parameters
                raw_ts_type = dict(src_df.dtypes).get(
                    twp.timestamp_column) if twp else None
                # Naive-datetime literals (and ntz casts) are interpreted in
                # the SESSION timezone — build the wall-clock literal there,
                # not in UTC, or a non-UTC session shifts the pushed-down
                # bound by the tz offset and silently prunes in-window rows.
                sess_tz = None
                try:
                    from zoneinfo import ZoneInfo
                    tz_name = src_df.sparkSession.conf.get(
                        "spark.sql.session.timeZone")
                    sess_tz = ZoneInfo(tz_name)
                except Exception:
                    pass  # unparseable tz (e.g. GMT+08:00) → no pushdown form
                if twp and twp.timestamp_column_format is None and \
                        raw_ts_type in ("timestamp", "timestamp_ntz") and \
                        sess_tz is not None:
                    # Predicate on the RAW column with timestamp literals —
                    # this form reaches parquet PushedFilters (row-group +
                    # partition pruning); an expression like
                    # unix_millis(cast(...)) does not.
                    from datetime import datetime as _dt
                    lo_lit = _dt.fromtimestamp(lo_ms / 1000, tz=sess_tz).replace(tzinfo=None)
                    hi_lit = _dt.fromtimestamp(hi_ms / 1000, tz=sess_tz).replace(tzinfo=None)
                    raw = F.col(twp.timestamp_column)
                    lo_c = F.lit(lo_lit).cast(raw_ts_type)  # match ntz/ltz exactly
                    hi_c = F.lit(hi_lit).cast(raw_ts_type)
                    src_df = src_df.where((raw > lo_c) & (raw <= hi_c))
                else:
                    src_ms = F.unix_millis(F.col(EVENT_TS_COL).cast("timestamp"))
                    src_df = src_df.where((src_ms > lo_ms) & (src_ms <= hi_ms))
        return point_in_time_aggregate(
            obs, src_df,
            obs_keys=list(obs_keys), src_keys=list(src_keys),
            obs_ts=EVENT_TS_COL, src_ts=EVENT_TS_COL,
            specs=specs,
            strategy=getattr(self, "_pit_strategy", "auto"),
        )

    def to_feature_config(self) -> dict:
        """Serialize definitions in the reference's feature-config shape
        (IR #1, project.rs:321-325 / 374-437): ``sources``, ``anchors``
        (group → key sqlExpr + features with type/def/aggregation), and
        ``derivations``. Our engine never round-trips through this config —
        it exists for interop/debugging parity with the reference."""
        from .registry.roundtrip import source_to_dict

        def transform_entry(f: Feature) -> dict:
            t = f.transform
            if isinstance(t, WindowAggTransform):
                d = {"def": t.def_expr, "aggregation": t.agg_func.value,
                     "window": t.window}
                if t.filter:
                    d["filter"] = t.filter
                if t.group_by:
                    d["groupBy"] = t.group_by
                if t.limit is not None:
                    d["limit"] = t.limit
                if t.agg_param is not None:
                    d["agg_param"] = t.agg_param
                return d
            if isinstance(t, UdfTransform):
                return {"udf": t.name}
            assert isinstance(t, ExpressionTransform)
            return {"def": {"sqlExpr": t.sql_expr}}

        anchors = {}
        for aname, anchor in self.anchors.items():
            feats = {}
            for f in anchor.features:
                feats[f.name] = transform_entry(f)
            key_cols = list(anchor.features[0].key_aliases)
            anchors[aname] = {
                "source": anchor.source.name,
                "key": {"sqlExpr": key_cols},
                "features": feats,
            }
        derivations = {
            d.name: {"definition": {"sqlExpr": d.transform.sql_expr},
                     "inputs": list(d.input_names),
                     "key": [k.alias for k in d.key]}
            for d in self.derived.values()
        }
        sources = {s.name: source_to_dict(s) for s in self.sources.values()
                   if not s.is_input_context}
        return {"anchors": anchors, "derivations": derivations,
                "sources": sources}

    def to_join_config(self, observation: ObservationSettings,
                       feature_queries, output_path: str) -> dict:
        """Serialize a join request in the reference's FeatureJoinConfig
        shape (IR #2, project.rs:327-357 / observation.rs:50-97):
        observationPath, settings.joinTimeSettings.timestampColumn
        {def, format}, featureList [{featureList, key}], outputPath. Like
        ``to_feature_config`` this is interop/debugging parity only — the
        engine plans directly from the dataclasses."""
        if isinstance(feature_queries, FeatureQuery):
            feature_queries = [feature_queries]
        settings: dict = {}
        if observation.timestamp_column is not None:
            ts = {"def": observation.timestamp_column}
            if observation.timestamp_format is not None:
                ts["format"] = observation.timestamp_format
            settings["joinTimeSettings"] = {"timestampColumn": ts}
        feature_list = []
        for q in feature_queries:
            key = q.key
            if key is None:
                anchor_feats, _ = self._resolve(q.feature_list)
                key = tuple(anchor_feats[0][1].key_aliases) if anchor_feats \
                    else ()
            feature_list.append({"featureList": list(q.feature_list),
                                 "key": list(key)})
        return {"observationPath": observation.observation_path,
                "settings": settings,
                "featureList": feature_list,
                "outputPath": output_path}

    def to_materialization_configs(
            self, settings: MaterializationSettings) -> List[dict]:
        """One config per cutoff, newest first, in the reference's
        feature-generation shape (materialization.rs:149-231: operational
        {name, endTime 'yyyy-MM-dd HH:mm:ss', resolution, output sinks} +
        feature name list; one submitted job per cutoff,
        job_client/mod.rs:756-793)."""
        from .materialization import sink_to_dict
        cutoffs = (settings.backfill_time.cutoffs()
                   if settings.backfill_time else [])
        resolution = (settings.backfill_time.step
                      if settings.backfill_time else "DAILY")
        return [{
            "operational": {
                "name": settings.name,
                "endTime": cutoff.strftime("%Y-%m-%d %H:%M:%S"),
                "endTimeFormat": "yyyy-MM-dd HH:mm:ss",
                "resolution": resolution,
                "output": [sink_to_dict(s) for s in settings.sinks],
            },
            "features": list(settings.feature_names),
        } for cutoff in cutoffs]

    def save_offline_features(self, observation, feature_query, sink,
                              **kwargs) -> None:
        """Offline join-job output (reference project.rs:266-277): compute
        the feature join and write it through a sink (any GenericSink —
        format/path/mode/options; ``num_parts`` mirrors ``--num-parts``,
        with the sink's ``exact_parts`` flag choosing between the exact
        ``repartition(n)`` contract and a shuffle-free ``coalesce`` upper
        bound for shrink-heavy jobs)."""
        df = self.get_offline_features(observation, feature_query, **kwargs)
        sink.write(df)

    # ------------------------------------------------------------------
    # materialization (reference entry point B, project.rs:283-308)
    # ------------------------------------------------------------------
    def compute_snapshot(self, spark: SparkSession, feature_names: Sequence[str],
                         cutoff: datetime) -> DataFrame:
        """Latest-per-key feature values as of ``cutoff``: windowed features
        aggregate over (cutoff − w, cutoff]; plain keyed features take the
        LATEST row per key (or any row for non-time-aware sources)."""
        return self._compute_snapshots(spark, feature_names, [cutoff])

    def _compute_snapshots(self, spark: SparkSession,
                           feature_names: Sequence[str],
                           cutoffs: Sequence[datetime]) -> DataFrame:
        """Snapshots for every cutoff in ONE pass per source group.

        Each source row is fanned out to the cutoffs it can contribute to
        with ``explode(filter(<literal cutoff array>, c -> ts <= c))`` — a
        narrow per-row projection, NO join (a broadcast range join against
        a cutoff table would plan a BroadcastNestedLoopJoin; the literal
        array is evaluated inside the scan stage) — then ONE
        ``groupBy(keys, cutoff)``. So an N-cutoff backfill costs one
        source scan and one shuffle, not N of each; map-side partial
        aggregation compresses the fan-out to |keys| × N rows before the
        exchange. Per-cutoff window masks are ordinary aggregate-input
        expressions referencing the exploded cutoff column.

        A key keeps a (possibly all-NULL) row for every cutoff at or after
        its first source row — identical to the per-cutoff formulation
        (filter ``ts <= cutoff`` then aggregate), which is why stale keys
        are not pruned by window reach here.
        """
        register_feathr_functions(spark)
        anchor_feats, derived_order = self._resolve(feature_names)
        if not cutoffs:
            raise FeathrError("no cutoffs to materialize")

        groups: Dict[Tuple, List[Tuple[FeatureAnchor, Feature]]] = {}
        for anchor, f in anchor_feats:
            if anchor.is_passthrough:
                raise FeathrError(
                    f"{f.name}: passthrough features cannot be materialized")
            gkey = (anchor.source.name, tuple(k.key_column for k in f.key),
                    tuple(k.alias for k in f.key))
            groups.setdefault(gkey, []).append((anchor, f))

        # naive cutoffs are interpreted as UTC (the engine pins timestamps
        # to UTC instants; see also the tests' session timeZone=UTC)
        from datetime import timezone
        cut_items = []
        for cutoff in cutoffs:
            cutoff_utc = (cutoff if cutoff.tzinfo
                          else cutoff.replace(tzinfo=timezone.utc))
            cut_items.append((cutoff.strftime("%Y-%m-%d %H:%M:%S"),
                              int(cutoff_utc.timestamp() * 1000)))
        cut_array = F.array(*[
            F.struct(F.lit(s).alias("cut_str"), F.lit(ms).alias("cut_ms"))
            for s, ms in cut_items])

        from .model import Aggregation
        from .operators.aggregations import simple_agg
        result: Optional[DataFrame] = None
        join_keys: Optional[List[str]] = None
        feature_order: List[str] = []
        for (src_name, src_keys, aliases), feats in groups.items():
            anchor = feats[0][0]
            src_df = anchor.source.load(spark)
            time_aware = EVENT_TS_COL in src_df.columns
            if time_aware:
                ts_ms = F.unix_millis(F.col(EVENT_TS_COL).cast("timestamp"))
                fanned = src_df.withColumn(
                    "__cut", F.explode(F.filter(
                        cut_array, lambda c: ts_ms <= c["cut_ms"])))
            else:
                fanned = src_df.withColumn("__cut", F.explode(cut_array))
            aggs = []
            for _, f in feats:
                t = f.transform
                if isinstance(t, WindowAggTransform):
                    if not time_aware:
                        raise FeathrError(f"{f.name}: windowed feature needs event time")
                    v = F.when(
                        F.unix_millis(F.col(EVENT_TS_COL).cast("timestamp"))
                        > F.col("__cut")["cut_ms"] - t.window_ms,
                        feathr_expr(t.def_expr))
                    if t.filter:
                        v = F.when(feathr_expr(t.filter), v)
                    # ts in epoch MILLIS to match obs_ts (cut_ms): DECAY
                    # subtracts the two; order-based aggs (NOP/LATEST) are
                    # unaffected by the monotone unit change.
                    aggs.append(simple_agg(t.agg_func, v, ts_ms,
                                           t.agg_param,
                                           obs_ts=F.col("__cut")["cut_ms"])
                                .alias(f.name))
                else:
                    assert isinstance(t, ExpressionTransform)
                    v = feathr_expr(t.sql_expr)
                    agg = Aggregation.LATEST if time_aware else Aggregation.NOP
                    ts = F.col(EVENT_TS_COL) if time_aware else F.lit(0)
                    aggs.append(simple_agg(agg, v, ts).alias(f.name))
                feature_order.append(f.name)
            # cut_ms is grouped alongside cut_str (1:1 — group set is
            # unchanged) so DECAY's post-transform may reference the cutoff
            # epoch as a grouping expression.
            snap = fanned.groupBy(
                *[F.col(sk).alias(a) for sk, a in zip(src_keys, aliases)],
                F.col("__cut")["cut_str"].alias("feathr_cutoff"),
                F.col("__cut")["cut_ms"].alias("__feathr_cut_ms"),
            ).agg(*aggs).drop("__feathr_cut_ms")
            if result is None:
                result, join_keys = snap, list(aliases)
            else:
                if list(aliases) != join_keys:
                    raise FeathrError(
                        "materialized features must share key aliases "
                        f"({join_keys} vs {list(aliases)})")
                result = result.join(snap, on=join_keys + ["feathr_cutoff"],
                                     how="full_outer")

        if result is None:
            raise FeathrError("no features to materialize")
        for d in derived_order:
            result = result.withColumn(d.name, feathr_expr(d.transform.sql_expr))
            feature_order.append(d.name)
        # column order matches the historical per-cutoff shape:
        # keys..., features..., feathr_cutoff last
        return result.select(*join_keys, *feature_order, "feathr_cutoff")

    def compute_backfill(self, spark: SparkSession, feature_names: Sequence[str],
                         backfill_time) -> DataFrame:
        """All backfill snapshots as one DataFrame (``feathr_cutoff``
        distinguishes them). Same cutoff stepping as
        ``materialize_features`` (materialization.rs:200-231) without the
        sink writes — useful for validation and for sinks that ingest the
        whole backfill in one write.

        Unlike the reference's one-job-per-cutoff submission loop, all
        cutoffs run in a single pass: one source scan + one shuffle total
        (see :meth:`_compute_snapshots`) — the difference between 365
        scans and 1 for a year's daily backfill."""
        cutoffs = backfill_time.cutoffs()
        if not cutoffs:
            raise FeathrError("backfill range produced no cutoffs")
        return self._compute_snapshots(spark, feature_names, cutoffs)

    def materialize_features(self, settings: MaterializationSettings,
                             spark: Optional[SparkSession] = None) -> List[datetime]:
        """One snapshot per backfill cutoff, iterating backwards from end
        (materialization.rs:200-231), written to every sink
        (job_client/mod.rs:701-723 — frame cached once, N writes)."""
        spark = spark or self.spark
        bt = settings.backfill_time
        if bt is None:
            raise FeathrError("materialization requires backfill_time")
        written = []
        for cutoff in bt.cutoffs():
            df = self.compute_snapshot(spark, settings.feature_names, cutoff)
            if len(settings.sinks) > 1:
                df = df.cache()
            for sink in settings.sinks:
                sink.write(df)
            written.append(cutoff)
        return written
