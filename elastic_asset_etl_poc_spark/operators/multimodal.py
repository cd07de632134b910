"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns plus typed metadata; decode /
feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages.  Audio WAV/PCM decodes for REAL (stdlib
``wave`` — no codec libs needed); image/video kernels are stubbed
deterministically because the container lacks PIL/ffmpeg — the
Spark-side contract (schemas, batch shapes, partitioning, UDF
signatures, fail-soft rows) is real and tested either way, which is the
part that matters for the 100 TB plan: a codec swap never changes the
plan.

Scale posture: media rows are fat (MBs) — keep
``spark.sql.files.maxPartitionBytes`` low for balanced tasks, never
shuffle raw bytes (derive features first, then drop the binary column
before any join/groupBy), and use ``mapInPandas`` (streaming Arrow
batches) rather than collecting rows.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: schema of a decoded-image feature row
IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("mean_luma", T.DoubleType()),
    ]
)

FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_bytes", T.BinaryType()),
    ]
)


def _decode_image_stub(payload: bytes) -> tuple[int, int, float]:
    """STUB — no codec libs in this container.

    Deterministic fake: derives (width, height, mean_luma) from the byte
    content so tests are stable.  A real deployment replaces this one
    function with PIL/libvips; everything around it is unchanged.
    """
    n = len(payload)
    w = 16 + (n % 64)
    h = 16 + ((n // 64) % 64)
    luma = (sum(payload[:256]) / max(min(n, 256), 1)) if n else 0.0
    return w, h, luma


def extract_image_features(df: DataFrame, id_col: str = "media_id", bin_col: str = "payload") -> DataFrame:
    """Decode + feature-extract via Arrow-batched ``mapInPandas``.

    Input: (id_col long, bin_col binary, ...).  One output row per input
    row; the binary column never leaves the stage.
    """
    import pandas as pd

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[bin_col]):
                b = bytes(payload) if payload is not None else b""
                w, h, luma = _decode_image_stub(b)
                rows.append((mid, w, h, len(b), luma))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "n_bytes", "mean_luma"]
            )

    return df.select(id_col, bin_col).mapInPandas(batches, IMAGE_FEATURES_SCHEMA)


def sample_frames(
    df: DataFrame,
    every_n: int = 10,
    id_col: str = "media_id",
    bin_col: str = "payload",
) -> DataFrame:
    """Frame-sample a video payload: emit every Nth "frame".

    STUB container decode: treats the payload as fixed 1 KiB frames.  Real
    codec swap touches only the slicing loop.  Output fan-out (rows out >
    rows in) is why this is ``mapInPandas`` and not a scalar UDF.
    """
    import pandas as pd

    frame_size = 1024

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[bin_col]):
                b = bytes(payload) if payload is not None else b""
                n_frames = max(len(b) // frame_size, 0)
                for i in range(0, n_frames, every_n):
                    rows.append((mid, i, b[i * frame_size : (i + 1) * frame_size]))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_bytes"])

    return df.select(id_col, bin_col).mapInPandas(batches, FRAME_SAMPLE_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_sec", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("decode_ok", T.BooleanType()),
    ]
)


def extract_audio_features(
    df: DataFrame, id_col: str = "media_id", bin_col: str = "payload"
) -> DataFrame:
    """REAL audio decode for WAV/PCM — pure stdlib (``wave``), no codec
    libraries needed — via the same Arrow ``mapInPandas`` shape as the
    image stage.  Emits (sample_rate, channels, samples, duration, rms)
    per row.

    Fail-soft: compressed formats (mp3/ogg — which DO need external
    codecs) or corrupt payloads yield ``decode_ok=false`` with NULL
    features instead of failing the task — at corpus scale one bad file
    must never kill a 10⁶-row partition.  A deployment adding soundfile/
    ffmpeg extends only the per-payload branch; the plan is unchanged.
    """
    import io
    import wave

    import numpy as np
    import pandas as pd

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[bin_col]):
                b = bytes(payload) if payload is not None else b""
                try:
                    with wave.open(io.BytesIO(b)) as w:
                        sr = w.getframerate()
                        nch = w.getnchannels()
                        nf = w.getnframes()
                        sw = w.getsampwidth()
                        raw = w.readframes(nf)
                    dtype = {1: np.uint8, 2: np.int16, 4: np.int32}[sw]
                    x = np.frombuffer(raw, dtype=dtype).astype(np.float64)
                    if sw == 1:
                        x = x - 128.0  # 8-bit WAV is unsigned
                    scale = float(1 << (8 * sw - 1)) if sw > 1 else 128.0
                    rms = float(np.sqrt(np.mean((x / scale) ** 2))) if x.size else 0.0
                    rows.append(
                        (mid, sr, nch, nf, nf / sr if sr else 0.0, round(rms, 6), True)
                    )
                except Exception:
                    rows.append((mid, None, None, None, None, None, False))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "sample_rate",
                    "n_channels",
                    "n_samples",
                    "duration_sec",
                    "rms",
                    "decode_ok",
                ],
            )

    return df.select(id_col, bin_col).mapInPandas(batches, AUDIO_FEATURES_SCHEMA)


def synthetic_audio(spark, n: int = 32) -> DataFrame:
    """Deterministic WAV fixtures: (media_id, payload binary) — 16-bit
    mono sine bursts of varying pitch/length, built with the stdlib
    writer so :func:`extract_audio_features` exercises a REAL decode.
    Every 8th payload is garbage bytes to exercise the fail-soft path.
    """
    import io
    import math
    import struct
    import wave

    rows = []
    for i in range(n):
        if i % 8 == 7:
            rows.append((i, b"not a wav" * 3))
            continue
        sr = 8000
        n_samp = 400 + 50 * (i % 5)
        freq = 220.0 * (1 + i % 4)
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(
                b"".join(
                    struct.pack(
                        "<h", int(12000 * math.sin(2 * math.pi * freq * t / sr))
                    )
                    for t in range(n_samp)
                )
            )
        rows.append((i, buf.getvalue()))
    return spark.createDataFrame(rows, "media_id long, payload binary")


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests: (media_id, payload binary)."""
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.encode(
            F.concat_ws("", F.transform(F.sequence(F.lit(0), (F.pmod(F.col("id"), 7) + 2) * 1024), lambda i: F.lit("x"))),
            "utf-8",
        ).alias("payload"),
    )
