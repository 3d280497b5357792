"""Multimodal (image/audio/video) column plumbing.

Design: media payloads are opaque ``binary`` columns traveling with typed
metadata structs; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas functions over ``mapInPandas`` so the Python cost is
amortized per batch, never per row. Partitioning: media rows are fat —
callers should ``repartition`` by a size-aware key so one task doesn't
inhale a skewed shard of large blobs.

The actual codec step is STUBBED (image/audio libraries are not in this
container): ``decode_image`` raises NotImplementedError unless
``fake=True``, which produces a deterministic fake decode so the
Spark-side plumbing (schema, batching, partition shape) is fully
exercised and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("mean_luma", T.DoubleType(), True),
        T.StructField("phash", T.LongType(), True),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int, int, float, int]:
    """Deterministic fake 'decode' derived from the payload bytes alone.

    Stands in for a real image codec (PIL/OpenCV are not installed —
    STUB, clearly marked). Replace the body with a real decode when the
    runtime has the libs; the Spark plumbing stays identical.
    """
    import hashlib

    h = hashlib.sha256(payload or b"").digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    channels = 3
    mean_luma = h[2] / 255.0
    phash = int.from_bytes(h[3:11], "big", signed=True)
    return width, height, channels, mean_luma, phash


def extract_image_features(media: DataFrame, fake: bool = False) -> DataFrame:
    """media (MEDIA_SCHEMA) -> IMAGE_FEATURES_SCHEMA via mapInPandas.

    Arrow batches flow in/out; per-batch Python overhead only. With
    ``fake=False`` this raises NotImplementedError at execution time (no
    codec libraries in this container).
    """

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "image decode requires a codec library not present in this "
                    "container; run with fake=True to exercise the pipeline"
                )
            rows = [
                (int(mid), *_fake_decode(payload))
                for mid, payload in zip(pdf["media_id"], pdf["payload"])
            ]
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "channels", "mean_luma", "phash"]
            )

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=IMAGE_FEATURES_SCHEMA
    )


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("duration_s", T.DoubleType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("rms", T.DoubleType(), True),
    ]
)


def extract_audio_features(media: DataFrame, fake: bool = False) -> DataFrame:
    """audio rows -> AUDIO_FEATURES_SCHEMA via mapInPandas (codec STUBBED,
    same contract as extract_image_features)."""

    def batches(it: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "audio decode requires a codec library not present in this "
                    "container; run with fake=True to exercise the pipeline"
                )
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                h = hashlib.sha256(payload or b"").digest()
                rows.append(
                    (
                        int(mid),
                        1.0 + h[0] % 30,
                        [8000, 16000, 44100, 48000][h[1] % 4],
                        1 + h[2] % 2,
                        h[3] / 255.0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "duration_s", "sample_rate", "channels", "rms"],
            )

    return (
        media.filter(F.col("kind") == "audio")
        .select("media_id", "payload")
        .mapInPandas(batches, schema=AUDIO_FEATURES_SCHEMA)
    )


def sample_video_frames(
    media: DataFrame, every_n_seconds: float = 1.0, fake: bool = False
) -> DataFrame:
    """video rows -> one row per sampled frame (media_id, frame_idx, ts_s,
    frame_payload). Frame extraction is the stubbed step."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("ts_s", T.DoubleType(), False),
            T.StructField("frame_payload", T.BinaryType(), True),
        ]
    )

    def batches(it: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "video decode requires a codec library not present in this "
                    "container; run with fake=True to exercise the pipeline"
                )
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                # fake: derive a deterministic duration & frames from bytes
                h = hashlib.sha256(payload or b"").digest()
                duration = 1 + h[0] % 10
                n = int(duration / every_n_seconds)
                for i in range(n):
                    out.append(
                        (int(mid), i, i * every_n_seconds, h[: 16])
                    )
            yield pd.DataFrame(
                out, columns=["media_id", "frame_idx", "ts_s", "frame_payload"]
            )

    return media.filter(F.col("kind") == "video").select("media_id", "payload").mapInPandas(
        batches, schema=schema
    )


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (payload = seeded bytes)."""
    rows = [
        (
            i,
            ["image", "audio", "video"][i % 3],
            ["image/png", "audio/wav", "video/mp4"][i % 3],
            bytes([(i * 7 + j) % 256 for j in range(128)]),
            {"source": f"src{i % 4}"},
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
