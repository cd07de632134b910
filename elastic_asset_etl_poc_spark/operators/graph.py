"""Asset-graph operators (reference §2.3 J2/J3, §2.4 A3/A4).

The reference builds its parent/child/reference graph with linear
``Array.find`` + ``push`` accumulation — O(n²) client-side
(lib/collectServices.ts:125-168, lib/collectPods.ts:90-112).  The Spark
formulation is group-and-collect: derive one edge row per (owner, edge
type, target EAN), then hash-aggregate ``collect_set`` per owner.  One
shuffle, linear, spillable — same result set (SURVEY.md A3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_collect_edges(
    df: DataFrame,
    owner_cols: list[str],
    edge_cols: dict[str, str],
    extra_aggs: dict[str, F.Column] | None = None,
) -> DataFrame:
    """A3/J2/J3: per-owner distinct edge collection.

    ``edge_cols`` maps output column → input EAN column; each becomes
    ``sort_array(collect_set(col))`` — distinct (A4's find-before-push)
    and sorted so downstream hashing is order-insensitive
    (``collect_set`` order is nondeterministic across partitions).
    """
    aggs = [
        F.sort_array(F.collect_set(F.col(f"`{src}`"))).alias(out)
        for out, src in edge_cols.items()
    ]
    for name, agg in (extra_aggs or {}).items():
        aggs.append(agg.alias(name))
    return df.groupBy(*[F.col(f"`{c}`") for c in owner_cols]).agg(*aggs)
