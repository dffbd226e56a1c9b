"""Feature definitions: anchor features, anchor groups, derived features.

Re-expresses /root/reference/feathr-rs/src/feature.rs and
feature_builder.rs as dataclasses with the same validation rules.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple, Union

from .model import (
    ExpressionTransform,
    FeatureType,
    Transformation,
    TypedKey,
    WindowAggTransform,
    as_transformation,
)
from .source import INPUT_CONTEXT, Source


class FeathrError(Exception):
    pass


class DummyKeyUsedWithoutInputContext(FeathrError):
    """reference project.rs:522-526."""


class InvalidKeyAlias(FeathrError):
    """reference feature_builder.rs:163-186."""


@dataclass(frozen=True)
class Feature:
    """Anchor feature (reference feature.rs:213-221): a named column defined
    by a transformation over its anchor's source, keyed by TypedKeys."""
    name: str
    feature_type: FeatureType = field(default_factory=FeatureType)
    transform: Union[str, Transformation] = ""
    key: Tuple[TypedKey, ...] = ()
    registry_tags: dict = field(default_factory=dict)

    def __post_init__(self):
        object.__setattr__(self, "transform", as_transformation(self.transform))
        if not self.key:
            # builders default to the dummy key (feature_builder.rs:75-79)
            object.__setattr__(self, "key", (TypedKey.DUMMY_KEY(),))
        else:
            object.__setattr__(self, "key", tuple(self.key))

    @property
    def key_aliases(self) -> Tuple[str, ...]:
        return tuple(k.alias for k in self.key)

    @property
    def is_windowed(self) -> bool:
        return isinstance(self.transform, WindowAggTransform)

    def with_key(self, aliases: Sequence[str]) -> "Feature":
        """Re-alias keys for reuse under different join columns
        (reference feature.rs:224-241)."""
        if len(aliases) != len(self.key):
            raise InvalidKeyAlias(
                f"{self.name}: {len(aliases)} aliases for {len(self.key)} keys")
        return Feature(
            name=self.name,
            feature_type=self.feature_type,
            transform=self.transform,
            key=tuple(k.as_key(a) for k, a in zip(self.key, aliases)),
            registry_tags=self.registry_tags,
        )

    def as_feature(self, feature_alias: str) -> "Feature":
        """Rename for reuse under a different output column (reference
        feature.rs:230-241): the viewer/viewee pattern joins the SAME
        feature twice — once per key alias — and each occurrence needs
        its own column name. Chain with :meth:`with_key`:
        ``f.with_key(["viewer"]).as_feature("f_emb_viewer")``; register
        each aliased copy in its own anchor and the planner treats it as
        an ordinary feature."""
        return Feature(
            name=feature_alias,
            feature_type=self.feature_type,
            transform=self.transform,
            key=self.key,
            registry_tags=self.registry_tags,
        )


@dataclass(frozen=True)
class FeatureAnchor:
    """Anchor group (reference project.rs:600-656): named set of features
    computed from one source, sharing key columns.

    ``broadcast_hint`` marks the source as small enough to broadcast in
    keyed joins (engine extension — the reference delegates physical join
    choice entirely to Spark; AQE still decides when the hint is absent).
    """
    name: str
    source: Source
    features: Tuple[Feature, ...] = ()
    broadcast_hint: bool = False

    def __post_init__(self):
        object.__setattr__(self, "features", tuple(self.features))
        self.validate()

    def validate(self):
        if not self.features:
            raise FeathrError(f"anchor {self.name}: no features")
        # All features in one anchor must share the key alias list
        # (project.rs:501-504).
        aliases = {f.key_aliases for f in self.features}
        if len(aliases) > 1:
            raise FeathrError(
                f"anchor {self.name}: features have mismatched key aliases {aliases}")
        dummy = all(k.is_dummy for f in self.features for k in f.key)
        if self.source.is_input_context:
            if not dummy:
                raise FeathrError(
                    f"anchor {self.name}: INPUT_CONTEXT features must use DUMMY_KEY")
        else:
            # non-INPUT_CONTEXT source must have real keys (project.rs:522-526)
            if dummy:
                raise DummyKeyUsedWithoutInputContext(
                    f"anchor {self.name}: keyed source requires real TypedKeys")
        for f in self.features:
            if f.is_windowed and self.source.is_input_context:
                raise FeathrError(
                    f"{f.name}: window aggregation requires a time-aware source")
            if f.is_windowed and self.source.time_window_parameters is None \
                    and not self.source.is_input_context:
                raise FeathrError(
                    f"{f.name}: window aggregation requires time_window_parameters "
                    "on the source (reference source.rs:266-271)")

    @property
    def is_passthrough(self) -> bool:
        return self.source.is_input_context

    def __getitem__(self, name: str) -> Feature:
        """Anchor-group feature lookup by name (reference
        python/src/lib.rs AnchorGroup::__getitem__)."""
        for f in self.features:
            if f.name == name:
                return f
        raise KeyError(name)


@dataclass(frozen=True)
class FeatureRef:
    """By-name reference to a feature (resolved at query time); lets
    ``DerivedFeature(input_features=["f_a", "f_b"])`` take plain names."""
    name: str
    key: Tuple[TypedKey, ...] = ()


@dataclass(frozen=True)
class DerivedFeature:
    """Derived feature (reference feature.rs:319-328): expression over other
    features (anchor or derived), forming a DAG. ``input_features`` accepts
    Feature/DerivedFeature objects or plain feature-name strings."""
    name: str
    transform: Union[str, Transformation] = ""
    input_features: Tuple[Feature, ...] = ()
    feature_type: FeatureType = field(default_factory=FeatureType)
    key: Tuple[TypedKey, ...] = ()

    def __post_init__(self):
        object.__setattr__(self, "transform", as_transformation(self.transform))
        object.__setattr__(self, "input_features", tuple(
            FeatureRef(f) if isinstance(f, str) else f
            for f in self.input_features))
        if not self.key:
            keys: list = []
            seen = set()
            for f in self.input_features:
                for k in f.key:
                    if not k.is_dummy and k.alias not in seen:
                        seen.add(k.alias)
                        keys.append(k)
            object.__setattr__(self, "key", tuple(keys) or (TypedKey.DUMMY_KEY(),))
        else:
            object.__setattr__(self, "key", tuple(self.key))
        if not isinstance(self.transform, ExpressionTransform):
            raise FeathrError(f"derived {self.name}: transform must be an expression")

    @property
    def input_names(self) -> Tuple[str, ...]:
        return tuple(f.name for f in self.input_features)
