"""Skew mitigation: salted two-phase aggregation and salted joins.

AQE's skew-join splitting (enabled in session.py) handles most runtime
skew; these explicit forms cover the cases AQE can't see — aggregation
hot keys (one reducer owning a celebrity key) and broadcast-ineligible
joins against a skewed build side.

All salting is deterministic (hash of stable row attributes, not rand()),
so plans stay replayable and oracle-comparable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_col: str,
    buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation with a salt on the hot key.

    ``aggs`` maps output name → (function, input column) for decomposable
    aggregates (sum/count/min/max).  Phase 1 aggregates on
    (keys + salt) — the hot key's rows spread over ``buckets`` reducers —
    phase 2 merges the partials on the true keys.  The salt derives from
    ``xxhash64(salt_col)``: deterministic, no rand().
    """
    mergers = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    firsts = {"sum": F.sum, "count": lambda c: F.count(F.lit(1)), "min": F.min, "max": F.max}
    salt = F.pmod(F.xxhash64(F.col(salt_col)), F.lit(buckets)).alias("__salt")
    partial = df.groupBy(*[F.col(k) for k in keys], salt).agg(
        *[firsts[fn](col).alias(f"__p_{out}") for out, (fn, col) in aggs.items()]
    )
    return partial.groupBy(*[F.col(k) for k in keys]).agg(
        *[mergers[fn](f"__p_{out}").alias(out) for out, (fn, col) in aggs.items()]
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    buckets: int = 8,
    how: str = "inner",
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Skew-safe equi-join: salt the (large, skewed) left side, replicate
    the right side across the salt range.

    The hot key's rows land in ``buckets`` different shuffle partitions;
    the right side is duplicated ×buckets (explode over a literal range),
    which is the standard trade — only do this when the right side is
    modest and broadcast is off the table.  Columns keep their original
    names; join key must be equal-named on both sides.

    Only ``inner`` and ``left`` are supported: the right side is
    replicated ×buckets, so a right/outer join would emit every unmatched
    right row once per salt bucket.  The salt hashes stable row content
    (``salt_cols``, default all left columns) — per the module's
    determinism contract, routing is identical across retries and
    repartitionings (unlike ``monotonically_increasing_id``, which
    depends on partition layout).

    Determinism's trade: rows that are fully identical on ``salt_cols``
    share a salt bucket.  If the hot key's rows are EXACT duplicates
    (duplicated log lines), either aggregate them to (row, count) first
    or pass ``salt_cols`` including a distinguishing column (an event id).
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left' (got {how!r}): the "
            "replicated right side would duplicate unmatched right rows"
        )
    scols = salt_cols or left.columns
    lsalt = F.pmod(F.xxhash64(*[F.col(c) for c in scols]), F.lit(buckets))
    l = left.withColumn("__salt", lsalt)
    r = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    out = l.join(r, [key, "__salt"], how)
    return out.drop("__salt")


def skew_report(
    df: DataFrame, key_col: str, top_n: int = 10
) -> DataFrame:
    """Per-key distribution diagnostics — the planning step BEFORE a big
    join/agg on ``key_col``: find the hot keys that would pin a reducer
    and quantify how hot they are, so the pipeline can choose plain
    shuffle vs :func:`salted_agg`/:func:`salted_join` vs a per-key cap.

    Returns the ``top_n`` heaviest keys as (key, n_rows, pct_of_total,
    hot_ratio, rank) where ``hot_ratio`` is n_rows over the mean rows
    per key — a hot_ratio ≫ shuffle-partition count means one task owns
    the key no matter how wide the cluster.

    Scale shape: one hash-agg on the key (map-side partials), a 1-row
    global agg broadcast back, and a ``TakeOrderedAndProject`` top-n on
    the per-key count frame — the rank window runs only over the
    ``top_n`` survivors, never a global no-partition window (a corpus
    with billions of distinct keys would serialize one).
    """
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    totals = counts.agg(
        F.sum("n_rows").alias("__total"), F.count(F.lit(1)).alias("__n_keys")
    )
    top = counts.orderBy(F.col("n_rows").desc(), F.col("key").asc()).limit(top_n)
    w = Window.orderBy(F.col("n_rows").desc(), F.col("key").asc())
    return (
        top.crossJoin(F.broadcast(totals))
        .withColumn("rank", F.row_number().over(w))
        .select(
            "key",
            "n_rows",
            F.round(F.col("n_rows") * 100.0 / F.col("__total"), 4).alias(
                "pct_of_total"
            ),
            F.round(
                F.col("n_rows") * F.col("__n_keys") / F.col("__total"), 4
            ).alias("hot_ratio"),
            "rank",
        )
    )
