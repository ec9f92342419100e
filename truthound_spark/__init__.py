"""truthound_spark — a PySpark-native data-quality & data-pipeline engine.

Reimplements the capability surface of the reference framework (a Polars
LazyFrame data-quality validator; see SURVEY.md) Spark-first: checks compile
to pyspark.sql Column expressions fused into one aggregation job per suite;
joins/windows/streams map to native DataFrame / Structured Streaming plans.
"""

from truthound_spark.adapters import get_spark, load_table, to_dataframe  # noqa: F401
from truthound_spark.api import check, check_grouped  # noqa: F401
from truthound_spark.core.results import ValidationIssue, ValidationRunResult  # noqa: F401
from truthound_spark.maskers import mask  # noqa: F401
from truthound_spark.profiler import profile  # noqa: F401
from truthound_spark.scanners import scan  # noqa: F401
from truthound_spark.schema import Schema, learn  # noqa: F401
from truthound_spark.types import ResultFormat, ResultFormatConfig, Severity  # noqa: F401
from truthound_spark.drift.detectors import compare  # noqa: F401
from truthound_spark.reporters import render, save_report  # noqa: F401
from truthound_spark.sdk import ValidatorBuilder, validator  # noqa: F401
from truthound_spark.checkpoint import Checkpoint  # noqa: F401
from truthound_spark.lineage import ImpactAnalyzer, LineageTracker  # noqa: F401
from truthound_spark.suite_io import ValidationSuite, load_suite, save_suite  # noqa: F401
from truthound_spark.drift.detectors import compare_grouped  # noqa: F401
from truthound_spark.fingerprint import (  # noqa: F401
    DatasetFingerprint,
    diff_datasets,
    fingerprint_dataset,
)
from truthound_spark.quality_gates import (  # noqa: F401
    QualityGatePolicy,
    evaluate_quality_gate,
    gate_check,
)
from truthound_spark.lineage_openlineage import (  # noqa: F401
    OpenLineageAction,
    OpenLineageEmitter,
)
from truthound_spark import delta, drift, layout, ml, pipeline, sampled, sources, streaming  # noqa: F401

__version__ = "0.3.0"
