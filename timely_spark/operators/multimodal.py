"""Multimodal (image/audio/video) column plumbing.

Design: media payloads are opaque ``binary`` columns traveling with typed
metadata structs; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas functions over ``mapInPandas`` so the Python cost is
amortized per batch, never per row. Partitioning: media rows are fat —
callers should ``repartition`` by a size-aware key so one task doesn't
inhale a skewed shard of large blobs.

Codecs: uncompressed BMP (24/32-bit BI_RGB) and PCM WAV decode for REAL
— header parse + numpy pixel/sample math, no third-party codec library
needed — including a real 8x8 average-hash perceptual hash and PCM RMS.
Compressed formats (PNG/JPEG/MP3/MP4) stay STUBBED behind
NotImplementedError unless ``fake=True`` (their codec libraries are not
in this container); the Spark-side plumbing is identical either way.
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


def _decode_bmp(payload: bytes) -> tuple[int, int, int, float, int]:
    """Real decode of an uncompressed BI_RGB BMP: dimensions from the
    BITMAPINFOHEADER, mean luma over the BGR(A) pixel array, and a real
    8x8 average-hash (aHash) perceptual fingerprint — stdlib + numpy
    only."""
    import struct

    import numpy as np

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pix_off = struct.unpack_from("<I", payload, 10)[0]
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise NotImplementedError(f"BMP variant bpp={bpp} compression={compression}")
    channels = bpp // 8
    # rows are bottom-up unless height is negative, padded to 4 bytes
    abs_h = abs(height)
    stride = (width * channels + 3) & ~3
    px = np.frombuffer(payload, dtype=np.uint8, count=stride * abs_h, offset=pix_off)
    px = px.reshape(abs_h, stride)[:, : width * channels].reshape(abs_h, width, channels)
    if height > 0:
        px = px[::-1]
    b, g, r = px[..., 0].astype(np.float64), px[..., 1].astype(np.float64), px[..., 2].astype(np.float64)
    luma = 0.114 * b + 0.587 * g + 0.299 * r
    mean_luma = float(luma.mean()) / 255.0
    # aHash: 8x8 block means -> threshold at their mean -> 64-bit int
    ys = np.linspace(0, abs_h, 9, dtype=int)
    xs = np.linspace(0, width, 9, dtype=int)
    blocks = np.array(
        [
            [luma[ys[i]:max(ys[i + 1], ys[i] + 1), xs[j]:max(xs[j + 1], xs[j] + 1)].mean() for j in range(8)]
            for i in range(8)
        ]
    )
    bits = (blocks >= blocks.mean()).flatten()
    phash = 0
    for bit in bits:
        phash = (phash << 1) | int(bit)
    # to signed 64-bit (LongType)
    if phash >= 1 << 63:
        phash -= 1 << 64
    return width, abs_h, channels, mean_luma, phash


def _decode_wav(payload: bytes) -> tuple[float, int, int, float]:
    """Real decode of a PCM WAV: header via the stdlib ``wave`` module,
    RMS (normalized to [0, 1]) over the samples via numpy."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(payload), "rb") as w:
        rate = w.getframerate()
        channels = w.getnchannels()
        nframes = w.getnframes()
        sampwidth = w.getsampwidth()
        frames = w.readframes(nframes)
    duration = nframes / float(rate)
    if sampwidth == 2:
        x = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
    elif sampwidth == 1:
        x = (np.frombuffer(frames, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise NotImplementedError(f"WAV sample width {sampwidth}")
    rms = float(np.sqrt(np.mean(x * x))) if x.size else 0.0
    return duration, rate, channels, rms


def make_bmp(width: int, height: int, seed: int = 0) -> bytes:
    """Deterministic 24-bit uncompressed BMP fixture (test/bench data)."""
    import struct

    import numpy as np

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)
    stride = (width * 3 + 3) & ~3
    rows = np.zeros((height, stride), dtype=np.uint8)
    rows[:, : width * 3] = px.reshape(height, width * 3)
    body = rows[::-1].tobytes()  # bottom-up
    header = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + info + body


def make_wav(duration_s: float, sample_rate: int = 16_000, freq: float = 440.0,
             channels: int = 1) -> bytes:
    """Deterministic PCM16 sine-wave WAV fixture."""
    import io
    import wave

    import numpy as np

    n = int(duration_s * sample_rate)
    t = np.arange(n) / sample_rate
    x = (0.5 * np.sin(2 * np.pi * freq * t) * 32767).astype("<i2")
    if channels > 1:
        x = np.repeat(x, channels)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(x.tobytes())
    return buf.getvalue()


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

    Arrow batches flow in/out; per-batch Python overhead only. BMP
    payloads decode for REAL (``_decode_bmp``: dimensions, mean luma,
    aHash). Other formats raise NotImplementedError unless ``fake=True``
    (no PNG/JPEG codec library in this container).
    """

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if fake:
                    rows.append((int(mid), *_fake_decode(payload)))
                elif payload is not None and bytes(payload[:2]) == b"BM":
                    rows.append((int(mid), *_decode_bmp(bytes(payload))))
                else:
                    raise NotImplementedError(
                        "only uncompressed BMP decodes in-container; other image "
                        "formats need a codec library (run with fake=True to "
                        "exercise the pipeline)"
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "channels", "mean_luma", "phash"]
            )

    if "kind" in media.columns:
        media = media.filter(F.col("kind") == "image")
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
    """audio rows -> AUDIO_FEATURES_SCHEMA via mapInPandas. PCM WAV
    payloads decode for REAL (``_decode_wav``: duration, sample rate,
    channels, RMS); compressed audio stays stubbed behind ``fake``."""

    def batches(it: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if not fake and payload is not None and bytes(payload[:4]) == b"RIFF":
                    rows.append((int(mid), *_decode_wav(bytes(payload))))
                elif not fake:
                    raise NotImplementedError(
                        "only PCM WAV decodes in-container; compressed audio "
                        "needs a codec library (run with fake=True to exercise "
                        "the pipeline)"
                    )
                else:
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


def synthetic_media(spark, n: int = 64, real: bool = True) -> DataFrame:
    """Deterministic media table for tests/bench. ``real=True`` gives
    image rows actual BMP payloads and audio rows actual PCM WAVs (both
    decodable in-container); video payloads stay opaque seeded bytes
    (frame extraction is the remaining stub)."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        if real and kind == "image":
            payload = make_bmp(16 + i % 48, 16 + (i * 3) % 48, seed=i)
            mime = "image/bmp"
        elif real and kind == "audio":
            payload = make_wav(0.05 + (i % 10) / 100.0, 8000 + 1000 * (i % 3), freq=200.0 + i)
            mime = "audio/wav"
        else:
            payload = bytes([(i * 7 + j) % 256 for j in range(128)])
            mime = {"image": "image/png", "audio": "audio/mpeg", "video": "video/mp4"}[kind]
        rows.append((i, kind, mime, payload, {"source": f"src{i % 4}"}))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
