"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via mapInPandas.

The Spark-side architecture is REAL and tested (schema contract, Arrow
batch iteration, partition sizing); the actual media decoding is STUBBED
behind ``decoder=`` injection because media libs (PIL/ffmpeg/librosa) are
not in this container — a deterministic fake decoder keeps the pipeline
testable end-to-end. Swap ``decoder`` for a real one in production.

Design notes for 100 TB of media:
  * binary payloads stay columnar (parquet BINARY) — never collected;
    decode happens inside executors, one Arrow batch at a time
  * ``spark.sql.files.maxPartitionBytes`` (or an explicit repartition on a
    size-bucketed key) keeps per-task memory bounded when payloads are MBs
  * feature extraction emits fixed-size vectors/scalars → downstream ops
    are ordinary relational work
"""

from __future__ import annotations

from typing import Any, Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: schema contract for a multimodal asset table
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("payload", T.BinaryType()),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType())),
    ]
)


def validate_media_schema(df: DataFrame) -> list[str]:
    """Structural check that a frame satisfies the media-table contract."""
    problems = []
    fields = {f.name: f.dataType for f in df.schema.fields}
    for f in MEDIA_SCHEMA.fields:
        if f.name not in fields:
            problems.append(f"missing column {f.name}")
        elif fields[f.name].simpleString() != f.dataType.simpleString():
            problems.append(
                f"column {f.name}: expected {f.dataType.simpleString()}, got {fields[f.name].simpleString()}"
            )
    return problems


def fake_image_decoder(payload: bytes) -> dict[str, Any]:
    """Deterministic stand-in for image decode: derives a stable
    pseudo-width/height/channel + 8-dim feature vector from the bytes.
    Replace with PIL/cv2 in production (NotImplementedError-free so the
    plumbing is exercisable in tests)."""
    import hashlib

    h = hashlib.md5(payload or b"").digest()
    return {
        "width": 64 + h[0] % 192,
        "height": 64 + h[1] % 192,
        "channels": 3,
        "features": [b / 255.0 for b in h[:8]],
    }


def real_image_decoder(payload: bytes) -> dict[str, Any]:  # pragma: no cover
    """Production decoder slot — media libraries absent in this container."""
    raise NotImplementedError(
        "image decoding requires PIL/opencv; inject fake_image_decoder for tests"
    )


def extract_image_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "asset_id",
    decoder: Callable[[bytes], dict[str, Any]] = fake_image_decoder,
    batch_size_hint: int = 256,
) -> DataFrame:
    """Decode + featurize image payloads via mapInPandas.

    Output schema: (asset_id, width, height, channels, features:array<double>).
    The decoder runs once per row inside an Arrow batch loop — the canonical
    multimodal UDF shape (SURVEY Phase 6; mapInPandas for per-batch work).
    """
    out_schema = (
        f"{id_col} long, width int, height int, channels int, features array<double>"
    )

    def decode_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf[id_col], pdf[payload_col]):
                d = decoder(bytes(payload) if payload is not None else b"")
                rows.append(
                    {
                        id_col: aid,
                        "width": d["width"],
                        "height": d["height"],
                        "channels": d["channels"],
                        "features": d["features"],
                    }
                )
            yield pd.DataFrame(rows, columns=[id_col, "width", "height", "channels", "features"])

    return df.select(id_col, payload_col).mapInPandas(decode_batches, schema=out_schema)


def sample_video_frames(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "asset_id",
    frames_per_video: int = 4,
    decoder: Callable[[bytes], dict[str, Any]] | None = None,
) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame.

    Stub decode derives deterministic per-frame fingerprints; real impl
    would seek ffmpeg to evenly-spaced timestamps. Output:
    (asset_id, frame_index, frame_fingerprint)."""
    out_schema = f"{id_col} long, frame_index int, frame_fingerprint string"

    def sample_batches(batches):
        import hashlib

        import pandas as pd

        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload) if payload is not None else b""
                for i in range(frames_per_video):
                    rows.append(
                        {
                            id_col: aid,
                            "frame_index": i,
                            # payload bytes + decimal frame index — oracle-
                            # checkable (md5 over valid UTF-8 both engines)
                            "frame_fingerprint": hashlib.md5(
                                data + str(i).encode()
                            ).hexdigest(),
                        }
                    )
            yield pd.DataFrame(rows, columns=[id_col, "frame_index", "frame_fingerprint"])

    return df.select(id_col, payload_col).mapInPandas(sample_batches, schema=out_schema)


def media_size_stats(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Relational metadata over binary payloads (no decode): byte sizes —
    the partition-sizing signal for the repartition-by-size-bucket step."""
    return df.select(
        F.count(F.lit(1)).alias("n_assets"),
        F.sum(F.length(F.col(payload_col))).alias("total_bytes"),
        F.avg(F.length(F.col(payload_col))).alias("avg_bytes"),
        F.max(F.length(F.col(payload_col))).alias("max_bytes"),
    )
