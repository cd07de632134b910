"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns plus typed metadata; decode /
feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages.  The container has no codec libraries, so the
decode kernels are stubbed (deterministic fake or ``NotImplementedError``)
— but the Spark-side contract (schemas, batch shapes, partitioning,
UDF signatures) is real and tested, which is the part that matters for
the 100 TB plan: a codec swap never changes the plan.

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


def decode_audio(df: DataFrame, **_) -> DataFrame:
    """Audio decode requires codec libraries not present in this container."""
    raise NotImplementedError(
        "audio decode needs soundfile/ffmpeg — not available here; "
        "wire a mapInPandas stage like extract_image_features when present"
    )


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests: (media_id, payload binary)."""
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.encode(
            F.concat_ws("", F.transform(F.sequence(F.lit(0), (F.pmod(F.col("id"), 7) + 2) * 1024), lambda i: F.lit("x"))),
            "utf-8",
        ).alias("payload"),
    )
