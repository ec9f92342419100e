from truthound_spark.profiler.table_profiler import (  # noqa: F401
    ColumnProfile,
    TableProfile,
    profile,
    profile_grouped,
)

# A/B threshold experiments (reference profiler/ab_testing/__init__.py
# public surface) — imported lazily to keep `import truthound_spark`
# light; `from truthound_spark.profiler import ab_testing` works either
# way, this just makes the submodule discoverable on the package.
from truthound_spark.profiler import ab_testing  # noqa: F401
