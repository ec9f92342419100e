"""ML-assisted rule/threshold learning (reference: src/truthound/ml/
rule_learning/ and profiler/auto_threshold.py).

Everything here operates on PROFILES (O(columns) scalars produced by the
distributed one-pass profiler) or on bounded aggregate relations — the
raw data is never collected. That is the Spark-first inversion of the
reference, which samples rows to the driver (constraint_miner.py:101
``df.sample(...)``) before mining.
"""

from truthound_spark.ml.auto_threshold import (
    ColumnThresholds,
    HistoryThresholdLearner,
    ProfileHistoryStore,
    TableThresholds,
    ThresholdTuner,
    thresholds_to_suite,
    tune_thresholds,
)
from truthound_spark.ml.concept_drift import (
    ConceptDriftDetector,
    ConceptDriftResult,
    ConceptSummary,
    concept_drift_grouped,
    concept_drift_table,
)
from truthound_spark.ml.distribution_drift import (
    DistributionDriftDetector,
    DistributionDriftResult,
)
from truthound_spark.ml.ensemble import (
    EnsembleAnomalyDetector,
    IQRDetector,
    MADDetector,
    ZScoreDetector,
)
from truthound_spark.ml.feature_drift import (
    FeatureDriftDetector,
    FeatureDriftResult,
    FeatureDriftScore,
)
from truthound_spark.ml.monitoring import (
    AlertRule,
    AnomalyRule,
    ModelMonitor,
    ScoreSummary,
    ThresholdRule,
    TrendRule,
    summarize_scores,
)
from truthound_spark.ml.multivariate_drift import (
    MultivariateDriftDetector,
    MultivariateDriftResult,
    correlation_drift_table,
)
from truthound_spark.ml.persistence import ModelRegistry
from truthound_spark.ml.rule_learning import (
    ConstraintMiner,
    holdout_rule_eval,
    DataProfileRuleLearner,
    LearnedRule,
    PatternRuleLearner,
    RuleLearningResult,
    rules_to_suite,
)

__all__ = [
    "ColumnThresholds",
    "TableThresholds",
    "ThresholdTuner",
    "HistoryThresholdLearner",
    "ProfileHistoryStore",
    "thresholds_to_suite",
    "tune_thresholds",
    "LearnedRule",
    "RuleLearningResult",
    "DataProfileRuleLearner",
    "ConstraintMiner",
    "holdout_rule_eval",
    "PatternRuleLearner",
    "rules_to_suite",
    "EnsembleAnomalyDetector",
    "ZScoreDetector",
    "IQRDetector",
    "MADDetector",
    "ConceptDriftDetector",
    "ConceptDriftResult",
    "DistributionDriftDetector",
    "DistributionDriftResult",
    "FeatureDriftDetector",
    "FeatureDriftResult",
    "FeatureDriftScore",
    "MultivariateDriftDetector",
    "MultivariateDriftResult",
    "correlation_drift_table",
    "ConceptSummary",
    "concept_drift_table",
    "concept_drift_grouped",
    "ModelRegistry",
    "ModelMonitor",
    "AlertRule",
    "ThresholdRule",
    "AnomalyRule",
    "TrendRule",
    "ScoreSummary",
    "summarize_scores",
]
