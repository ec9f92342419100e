from truthound_spark.pipeline import dedup, multimodal, similarity, text  # noqa: F401
