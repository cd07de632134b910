"""Streaming data-quality monitors: the live form of the batch drift
gates.

``stream_drift_counts`` maintains the per-category reference/current
window counts that feed a PSI drift score as ONE streaming aggregation —
the shape a production corpus monitor actually runs (counts update as
ingest lands; the O(|categories|) PSI arithmetic is a view over the
maintained state, not a second corpus pass).

Scale posture: state = one row per category (bounded by the feature's
domain, not stream length); the conditional sums are the same map-side-
combining partials as the batch twin, applied per micro-batch.  Complete
output mode is correct here because the RESULT is domain-bounded — the
memory sink holds ≤ |categories| rows regardless of how much stream has
flowed.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .joins import stream_events_typed


def stream_drift_counts(
    spark: SparkSession,
    source_dir: str,
    split: datetime,
    now: datetime,
) -> DataFrame:
    """Streaming (event_type, nr, nc) window counts: nr = events before
    ``split`` (reference window), nc = events in [split, now] (current
    window).  One running grouped aggregation; events after ``now`` are
    dropped at the source filter."""
    ev = stream_events_typed(spark, source_dir)
    split_c = F.lit(split.strftime("%Y-%m-%d %H:%M:%S")).cast("timestamp")
    return (
        ev.filter(F.col("ts") <= F.lit(now.strftime("%Y-%m-%d %H:%M:%S")).cast("timestamp"))
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("ts") < split_c, 1).otherwise(0)).alias("nr"),
            F.sum(F.when(F.col("ts") >= split_c, 1).otherwise(0)).alias("nc"),
        )
    )


def stream_welch_sums(
    spark: SparkSession,
    source_dir: str,
    split: datetime,
    lower: datetime,
    now: datetime,
) -> DataFrame:
    """Streaming per-group Welch power sums: the six running aggregates
    (n, Σx, Σx²) for the recent window [split, now] vs the prior window
    [lower, split) — the live form of the batch A/B significance gate.
    One running grouped aggregation; state is six numbers per group,
    bounded by the group domain, never by stream length.  The t/df
    arithmetic (operators/stats.py welch_from_sums) is a static view
    over the drained state — the monitor ticks as ingest lands and the
    verdict is read without a second corpus pass."""
    ev = stream_events_typed(spark, source_dir)
    fmt = "%Y-%m-%d %H:%M:%S"
    split_c = F.lit(split.strftime(fmt)).cast("timestamp")
    recent = F.col("ts") >= split_c
    v = F.col("value")
    return (
        ev.filter(
            (F.col("ts") >= F.lit(lower.strftime(fmt)).cast("timestamp"))
            & (F.col("ts") <= F.lit(now.strftime(fmt)).cast("timestamp"))
        )
        .groupBy("event_type")
        .agg(
            F.sum(F.when(recent, 1).otherwise(0)).alias("na"),
            F.sum(F.when(recent, v)).alias("sa1"),
            F.sum(F.when(recent, v * v)).alias("sa2"),
            F.sum(F.when(~recent, 1).otherwise(0)).alias("nb"),
            F.sum(F.when(~recent, v)).alias("sb1"),
            F.sum(F.when(~recent, v * v)).alias("sb2"),
        )
    )
