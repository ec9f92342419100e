from truthound_spark.pipeline import (  # noqa: F401
    align,
    clustering,
    dedup,
    export,
    multimodal,
    neighbors,
    regression,
    report,
    retrieval,
    similarity,
    text,
    tokenizer,
)
