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
