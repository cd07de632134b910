"""Stream-stream joins: the live form of the batch temporal joins.

``stream_band_join`` pairs two event streams on a key within a time band
— the continuous phrasing of ``operators.temporal.band_join`` (click↔
purchase attribution, request↔response matching).  Structured Streaming
requires exactly what the batch operator's scale story already enforces:
an equi-key plus a bounded event-time range, so the state store can evict
rows once the watermark passes the band.

Scale posture: state per side ≈ (watermark + band) of history keyed by
the join key — bounded by TIME, not stream length.  The join itself is
the standard symmetric hash join over the state store; append output mode
emits each pair exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .services_stream import EVENTS_STREAM_SCHEMA


def stream_events_typed(spark: SparkSession, source_dir: str) -> DataFrame:
    """File-source stream of events with µs timestamps — the streaming
    twin of ``sources.registry.load_table('events')``: the fixture's
    TIMESTAMP_NTZ ts cast to TIMESTAMP (UTC session TZ → wall-clock
    no-op) so watermarks and interval joins can use it."""
    ev = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("pathGlobFilter", "*.parquet")
        .option("maxFilesPerTrigger", 8)
        .parquet(source_dir)
    )
    return ev.select(
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "user_id",
        "event_type",
        "value",
    )


def stream_band_join(
    spark: SparkSession,
    source_dir: str,
    left_type: str = "click",
    right_type: str = "purchase",
    on: str = "user_id",
    band_seconds: int = 86400,
    watermark: str = "30 days",
) -> DataFrame:
    """Stream-stream band join → one row per (left, right) pair with
    ``|left.ts − right.ts| ≤ band`` sharing ``on``.

    Two independent file-source streams (self-joins of one stream carry
    planner restrictions; separate sources keep the plan the canonical
    watermarked interval join).  The time-range predicate bounds both
    state stores: a row is dropped once the watermark is more than
    ``band`` past it.
    """
    left = (
        stream_events_typed(spark, source_dir)
        .filter(F.col("event_type") == left_type)
        .select(F.col(on), F.col("ts").alias("l_ts"))
        .withWatermark("l_ts", watermark)
    )
    right = (
        stream_events_typed(spark, source_dir)
        .filter(F.col("event_type") == right_type)
        .select(F.col(on).alias(f"{on}_r"), F.col("ts").alias("r_ts"), "value")
        .withWatermark("r_ts", watermark)
    )
    band = F.expr(
        f"r_ts >= l_ts - INTERVAL {band_seconds} SECOND AND "
        f"r_ts <= l_ts + INTERVAL {band_seconds} SECOND"
    )
    return (
        left.join(right, (F.col(on) == F.col(f"{on}_r")) & band, "inner")
        .drop(f"{on}_r")
    )
