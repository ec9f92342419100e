from truthound_spark.profiler.table_profiler import (  # noqa: F401
    ColumnProfile,
    TableProfile,
    profile,
    profile_grouped,
)


def __getattr__(name: str):
    """PEP 562 lazy submodule: the A/B threshold-experiment module
    (reference profiler/ab_testing/__init__.py public surface) is
    genuinely deferred until first attribute access, so
    ``import truthound_spark.profiler`` never pays its import weight.
    ``from truthound_spark.profiler import ab_testing`` still works —
    the import system falls back to this hook for missing attributes."""
    if name == "ab_testing":
        import importlib

        module = importlib.import_module("truthound_spark.profiler.ab_testing")
        globals()[name] = module
        return module
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
