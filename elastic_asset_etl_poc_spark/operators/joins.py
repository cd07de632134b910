"""Join operators (reference §2.3: J1; J2/J3 live in graph.py).

The reference's only true join is the two-phase IN-list semi-join: phase 1
collects distinct service names, phase 2 ships them into the probe query as
a ``terms`` clause (lib/collectServicesFromSummaries.ts:209-215,321-325).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def semi_join_in_list(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str | None = None,
    hint: str = "broadcast",
) -> DataFrame:
    """J1: left-semi join of signals against the phase-1 name list.

    The build side (distinct service names — small by construction: it is
    a deduplicated dimension) is broadcast, so the 100 TB probe side
    shuffles **zero** bytes: each scan task filters locally against the
    broadcast hash set.  This is the plan-native form of the reference's
    "ship the IN-list into the query" optimization; keeping it as a join
    (instead of ``collect()`` + ``isin``) leaves the list distributed and
    lets AQE drop the broadcast if the build side turns out huge, falling
    back to a shuffled hash semi-join.
    """
    bk = build_key or probe_key
    b = build.select(F.col(f"`{bk}`").alias("__bk")).distinct()
    if hint:
        b = b.hint(hint)
    return probe.join(b, on=probe[f"`{probe_key}`"] == b["__bk"], how="left_semi")


def fk_orphan_audit(
    child: DataFrame,
    fk_col: str,
    parent: DataFrame,
    pk_col: str,
    relation: str,
) -> DataFrame:
    """Referential-integrity audit for one child→parent edge: a one-row
    frame (relation, n_rows, n_null_fk, n_orphans).  The data-quality
    gate a pipeline runs after every ingest — silent FK breakage (late
    dims, partial loads) otherwise surfaces as quietly wrong joins
    downstream.

    Scale shape: the parent side reduces to DISTINCT keys before the
    join (never the parent payload), the child side carries only the FK
    column, and the orphan test is a left join + null-probe folded into
    one aggregation — AQE picks broadcast vs shuffle from the actual
    distinct-key size.
    """
    parents = parent.select(F.col(pk_col).alias("__pk")).distinct()
    fk = F.col(fk_col)
    joined = child.select(fk.alias("__fk")).join(
        parents, F.col("__fk") == F.col("__pk"), "left"
    )
    return joined.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("__fk").isNull(), 1)).alias("n_null_fk"),
        F.count(
            F.when(F.col("__fk").isNotNull() & F.col("__pk").isNull(), 1)
        ).alias("n_orphans"),
    ).select(F.lit(relation).alias("relation"), "n_rows", "n_null_fk", "n_orphans")
