"""SQL pushdown sources (reference: src/truthound/datasources/sql/base.py,
validators/pushdown_support.py:448-594)."""

from truthound_spark.sources.pushdown import (
    DuckDBSource,
    PushdownValidationEngine,
    SQLDialect,
    SQLiteSource,
    build_count_query,
    build_distinct_count_query,
    build_null_count_query,
    build_range_count_query,
    build_stats_query,
)

__all__ = [
    "DuckDBSource",
    "PushdownValidationEngine",
    "SQLDialect",
    "SQLiteSource",
    "build_count_query",
    "build_distinct_count_query",
    "build_null_count_query",
    "build_range_count_query",
    "build_stats_query",
]
