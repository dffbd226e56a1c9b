"""feathr_spark — a PySpark-native feature-store engine.

Same query/data-processing capabilities as the Azure/Feathr client
(reference at /root/reference/), re-expressed Spark-first: feature
definitions are Python dataclasses, the planner compiles them to DataFrame
transformations, and Catalyst/Tungsten do the physical work. No config
round-trip, no job submission.
"""

from .feature import DerivedFeature, FeathrError, Feature, FeatureAnchor
from .materialization import (
    BackfillTime,
    CosmosDbSink,
    GenericSink,
    HdfsSink,
    MaterializationSettings,
    RedisSink,
)
from .model import (
    Aggregation,
    ExpressionTransform,
    FeatureType,
    TypedKey,
    UdfTransform,
    ValueType,
    WindowAggTransform,
    parse_duration_ms,
)
from .client import FeathrClient, JobStatus
from .configio import (
    JoinRequest, from_feature_config, from_join_config, from_lineage,
)
from .project import FeathrProject, FeatureQuery
from .source import (
    INPUT_CONTEXT,
    DataFrameSource,
    GenericSource,
    HdfsSource,
    InputContext,
    JdbcSource,
    KafkaSource,
    ObservationSettings,
    TimeWindowParameters,
)

__version__ = "0.1.0"

__all__ = [
    "Aggregation", "BackfillTime", "CosmosDbSink", "DataFrameSource",
    "DerivedFeature", "ExpressionTransform", "FeathrClient", "FeathrError",
    "JobStatus", "Feature",
    "FeatureAnchor", "FeatureQuery", "FeathrProject", "FeatureType",
    "GenericSink", "GenericSource", "HdfsSink", "HdfsSource",
    "INPUT_CONTEXT", "InputContext", "JdbcSource", "KafkaSource",
    "JoinRequest", "MaterializationSettings", "ObservationSettings",
    "RedisSink", "TimeWindowParameters", "TypedKey", "UdfTransform",
    "ValueType", "WindowAggTransform", "from_feature_config",
    "from_join_config", "from_lineage", "parse_duration_ms",
]
