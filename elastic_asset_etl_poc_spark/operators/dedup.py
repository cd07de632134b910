"""Deduplication / collapse operators (reference §2.4: A1, A2).

The reference deduplicates client-side with O(n²) ``Array.find`` inside a
reduce (lib/collectServicesFromSummaries.ts:86-94); here both dedups are
shuffle-once hash aggregations that scale linearly and spill — the exact
fix SURVEY.md §4 calls for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dedup_latest(df: DataFrame, keys: list[str], ts_col: str) -> DataFrame:
    """A1: dedup by key, last-wins timestamp.

    The reference accumulates all pages sorted ts ASC and overwrites the
    timestamp on duplicate keys, so the survivor carries the **max**
    timestamp per key (lib/collectServicesFromSummaries.ts:86-94).  That is
    a plain hash aggregate — partial (map-side) aggregation halves the
    shuffle, and no global sort is needed at all.
    """
    return df.groupBy(*[F.col(f"`{k}`") for k in keys]).agg(
        F.max(F.col(f"`{ts_col}`")).alias(ts_col)
    )


def collapse_top1(
    df: DataFrame, key: str, ts_col: str, tiebreak: str | None = None
) -> DataFrame:
    """A2: top-1 document per key, newest first (ES ``collapse`` with
    ``sort @timestamp desc`` — lib/collectServices.ts:15-22,
    lib/collectPods.ts:15-22).

    ``row_number`` over (key ORDER BY ts DESC, tiebreak DESC) = 1.  A
    deterministic tiebreak column makes Spark and the DuckDB oracle agree
    when timestamps collide (SURVEY.md §7 hard part b).  The window is
    hash-partitioned by key — one shuffle, no global sort, and AQE handles
    skewed keys.  (``max_by(struct(...))`` would also work; ``row_number``
    keeps NULL-ordering explicit.)

    Note: the reference truncates collapse output at 1000 groups (Q5,
    lib/collectServices.ts:14) because it never paginates — an acknowledged
    bug (TODO at :20), NOT reproduced here; callers wanting the bug apply
    ``.limit(1000)`` on top.
    """
    order = [F.col(f"`{ts_col}`").desc()]
    if tiebreak:
        order.append(F.col(f"`{tiebreak}`").desc())
    w = Window.partitionBy(F.col(f"`{key}`")).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
