"""Built-in validator inventory (imports register every validator).

Mirrors the reference's 21-category registry
(src/truthound/validators/__init__.py:6-16: 263 registered validators).
Categories here: completeness, uniqueness, distribution, aggregate, string,
datetime, multi_column, referential, cross_table, query, timeseries,
business_rule, geospatial, profiling, drift, anomaly.
"""

from truthound_spark.validators import (  # noqa: F401
    aggregate,
    anomaly,
    business,
    completeness,
    corpus,
    datetime_checks,
    distribution,
    geospatial,
    ml_feature,
    model_quality,
    multi_column,
    privacy,
    profiling,
    query,
    referential,
    schema_structure,
    string,
    table,
    timeseries,
    uniqueness,
)
from truthound_spark.drift import validators as drift_validators  # noqa: F401 (registration)
from truthound_spark.validators import parity  # noqa: F401  (registration; AFTER drift —
#   aliases resolve names registered by every earlier import)
from truthound_spark.core.registry import (  # noqa: F401
    get_validator,
    list_categories,
    list_validators,
    register_validator,
    resolve,
)

#: The 7 default-instantiable core validators
#: (reference: validators/__init__.py:217-233).
DEFAULT_VALIDATORS = ["null", "duplicate", "range", "outlier", "format", "unique"]
