from truthound_spark.profiler.table_profiler import (  # noqa: F401
    ColumnProfile,
    TableProfile,
    profile,
    profile_grouped,
)
