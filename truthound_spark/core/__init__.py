from truthound_spark.core.base import ExpressionSpec, Validator  # noqa: F401
from truthound_spark.core.executor import BatchExpressionExecutor  # noqa: F401
from truthound_spark.core.results import ValidationIssue, ValidationRunResult  # noqa: F401
