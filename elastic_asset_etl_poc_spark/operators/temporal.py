"""Temporal joins Spark lacks natively: the as-of join.

``asof_join(left, right)`` enriches every left row with the most recent
right row at-or-before its timestamp, per key — the canonical "attach the
latest known state" operator (market data, feature stores, signal
enrichment).

Spark-first formulation (composition of built-ins, no custom physical
operator): tag and union both sides, then one window pass per key ordered
by (ts, right-before-left-on-ties); ``last(payload, ignorenulls=True)``
over an unbounded-preceding frame carries the latest right payload
forward onto each left row.

Scale posture: ONE shuffle on the key (the window exchange) — same cost
as a regular join of the two inputs, regardless of how many right rows
precede each left row.  The naive alternative (inequality join + top-1)
is a partial cross product; this union-window form never materializes
pairs.  Skewed keys hit the window sort: AQE skew handling plus a
two-level (salt by time-bucket, then merge) split if a single key's
history outgrows a partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: latest right row with ``right.ts <= left.ts``.

    Returns all left columns plus ``{payload}{suffix}`` columns (NULL when
    no right row precedes the left row).
    """
    payload = payload or [c for c in right.columns if c not in (on, right_ts)]

    lcols = left.columns
    l = left.withColumn("__ts", F.col(left_ts)).withColumn("__is_left", F.lit(1))
    for p in payload:
        l = l.withColumn(f"__p_{p}", F.lit(None).cast(dict(right.dtypes)[p]))
    r = (
        right.select(
            F.col(on),
            F.col(right_ts).alias("__ts"),
            *[F.col(p).alias(f"__p_{p}") for p in payload],
        )
        .withColumn("__is_left", F.lit(0))
    )
    for c in lcols:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(dict(l.dtypes)[c]))
    u = l.select(*lcols, "__ts", "__is_left", *[f"__p_{p}" for p in payload]).unionByName(
        r.select(*lcols, "__ts", "__is_left", *[f"__p_{p}" for p in payload])
    )

    # right rows sort before left rows on timestamp ties so "at-or-before"
    # includes same-instant state
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [
        F.last(F.col(f"__p_{p}"), ignorenulls=True).over(w).alias(f"{p}{suffix}")
        for p in payload
    ]
    return (
        u.select(*lcols, "__is_left", *carried)
        .filter(F.col("__is_left") == 1)
        .drop("__is_left")
    )


def band_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    band_seconds: int,
    left_ts: str = "ts",
    right_ts: str = "ts",
) -> DataFrame:
    """Band (range) join: pairs with ``|left.ts − right.ts| ≤ band``
    sharing a key.

    Scale-safe formulation: bucket both sides to band-width epochs and
    equi-join on (key, bucket) with each left row probing its bucket and
    both neighbors — any qualifying pair shares one of those three
    buckets, so the exact band predicate only filters a bounded candidate
    set.  A naive theta-join ``ON |l−r| ≤ band`` degenerates to a per-key
    cross product; this stays an equi-join shuffle.

    Returns all left+right columns (right's key/ts suffixed ``_r``).

    The band predicate evaluates on microsecond-precision epochs
    (``unix_micros``), so sub-second timestamps compare exactly —
    ``unix_timestamp`` would truncate to whole seconds and admit pairs up
    to ~1s outside the band.  Buckets are sized in the same unit.
    """
    band_us = band_seconds * 1_000_000
    lb = F.floor(F.unix_micros(F.col(left_ts)) / band_us)
    l = left.withColumn(
        "__b", F.explode(F.array(lb - 1, lb, lb + 1))
    )
    r = (
        right.withColumnRenamed(right_ts, f"{right_ts}_r")
        .withColumn("__b", F.floor(F.unix_micros(F.col(f"{right_ts}_r")) / band_us))
        .withColumnRenamed(on, f"{on}_r")
    )
    joined = l.join(
        r, (l["__b"] == r["__b"]) & (l[on] == r[f"{on}_r"]), "inner"
    ).drop("__b")
    band = F.abs(
        F.unix_micros(F.col(left_ts)) - F.unix_micros(F.col(f"{right_ts}_r"))
    ) <= band_us
    return joined.filter(band).drop(f"{on}_r")
