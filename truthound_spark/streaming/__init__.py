from truthound_spark.streaming.validate import (  # noqa: F401
    StreamingValidationSink,
    validate_stream,
    windowed_counts,
)
