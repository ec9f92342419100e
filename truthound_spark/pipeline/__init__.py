from truthound_spark.pipeline import (  # noqa: F401
    clustering,
    dedup,
    export,
    multimodal,
    neighbors,
    retrieval,
    similarity,
    text,
)
