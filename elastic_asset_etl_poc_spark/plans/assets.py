"""Entry points 2 & 3 (dormant collectors): asset-graph construction.

Reference: ``collectServices`` (lib/collectServices.ts:10-174) and
``collectPods`` (lib/collectPods.ts:10-118).  Both follow the same shape:
one collapsed scan (top-1 doc per key, newest first) then a client-side
reduce that builds `SimpleAsset` docs and links them into a
parent/child/reference graph with O(n²) find-or-create.

Spark phrasing: collapse = window top-1 (one shuffle); the find-or-create
accumulation = group-and-collect hash aggregation (one shuffle); the
"attribute comes from the row that *created* the asset" order dependence
(nodes get their cluster parent from the newest row, lib/collectPods.ts:98-110)
= top-1 window per node.  Linear, spillable, deterministic.

Deviations (documented, deliberate):
  * ``@timestamp`` is stamped with the caller's pinned ``now`` instead of
    wall-clock ``new Date()`` (X3) — determinism rule SURVEY.md §5.5.
  * The 1000-group collapse truncation (Q5) is not reproduced (it is an
    acknowledged bug — TODO lib/collectServices.ts:20); pass
    ``limit_groups=1000`` to opt back in.
  * Edge arrays are distinct + sorted (the reference can push duplicate
    pod EANs into container parents, lib/collectServices.ts:138-144).
"""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import collapse_top1
from ..operators.filters import exists_all, exists_any, time_window
from ..operators.graph import group_collect_edges
from ..functions.scalar import make_ean
from ..sources.registry import union_scan
from ..sources.signals import signals_view
from .services import PINNED_NOW

COLLECT_LOOKBACK_DAYS = 10  # fixture-scale analog of `gte: now-1h`


def _with_eans(df: DataFrame) -> DataFrame:
    """X1 EANs for every linkable entity on the row
    (lib/collectServices.ts:94-97)."""
    return (
        df.withColumn("service_ean", make_ean("service", F.col("`service.name`")))
        .withColumn(
            "container_ean",
            F.when(
                F.col("`container.id`").isNotNull(),
                make_ean("container", F.col("`container.id`")),
            ),
        )
        .withColumn(
            "pod_ean",
            F.when(
                F.col("`kubernetes.pod.uid`").isNotNull(),
                make_ean("k8s.pod", F.col("`kubernetes.pod.uid`")),
            ),
        )
        .withColumn(
            "node_ean",
            F.when(
                F.col("`kubernetes.node.name`").isNotNull(),
                make_ean("k8s.node", F.col("`kubernetes.node.name`")),
            ),
        )
    )


def collect_services(
    spark: SparkSession,
    sf_dir: str,
    now: datetime = PINNED_NOW,
    lookback_days: int = COLLECT_LOOKBACK_DAYS,
    limit_groups: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Service + container assets (lib/collectServices.ts).

    Returns ``(services, containers)`` in SimpleAsset column layout.
    """
    window = (now - timedelta(days=lookback_days), now)
    sig = signals_view(spark, sf_dir, ts_range=window)  # scan-level pruning
    sig = time_window(sig, "@timestamp", now, lookback_days, "d")
    sig = sig.filter(F.col("`service.name`").isNotNull())  # must: exists (F4)
    sig = exists_any(  # should, minimum_should_match: 1 (F5)
        sig, "container.id", "kubernetes.pod.uid", "host.name", "host.hostname"
    )
    top = collapse_top1(sig, "service.name", "@timestamp", tiebreak="event.id")
    if limit_groups:  # Q5 bug-compat switch
        top = top.orderBy(F.col("`@timestamp`").desc()).limit(limit_groups)
    top = _with_eans(top).cache()  # reused by both asset outputs

    services = top.select(
        F.lit(now).alias("@timestamp"),
        F.col("service_ean").alias("asset.ean"),
        F.lit("service").alias("asset.type"),
        F.col("`service.name`").alias("asset.id"),
        F.col("`service.name`").alias("asset.name"),
        # parents = [container ean] only when present (lib/collectServices.ts:107-109)
        F.when(
            F.col("container_ean").isNotNull(), F.array(F.col("container_ean"))
        ).alias("asset.parents"),
        F.lit(None).cast("array<string>").alias("asset.children"),
        # references = [pod?, node?] in cascade order (lib/collectServices.ts:115-121)
        F.array_compact(F.array(F.col("pod_ean"), F.col("node_ean"))).alias(
            "asset.references"
        ),
        F.col("`cloud.provider`").alias("cloud.provider"),
        F.lit(None).cast("string").alias("orchestrator.cluster.name"),
        F.col("`service.environment`").alias("service.environment"),
    )

    containers = (
        group_collect_edges(
            top.filter(F.col("container_ean").isNotNull()),
            owner_cols=["container_ean", "container.id"],
            edge_cols={
                "asset.children": "service_ean",
                "asset.parents": "pod_ean",
                "asset.references": "node_ean",
            },
        )
        .select(
            F.lit(now).alias("@timestamp"),
            F.col("container_ean").alias("asset.ean"),
            F.lit("container").alias("asset.type"),
            F.col("`container.id`").alias("asset.id"),
            F.lit(None).cast("string").alias("asset.name"),
            F.col("`asset.parents`"),
            F.col("`asset.children`"),
            F.col("`asset.references`"),
            F.lit(None).cast("string").alias("cloud.provider"),
            F.lit(None).cast("string").alias("orchestrator.cluster.name"),
            F.lit(None).cast("string").alias("service.environment"),
        )
    )
    return services, containers


def collect_pods(
    spark: SparkSession,
    sf_dir: str,
    now: datetime = PINNED_NOW,
    lookback_days: int = COLLECT_LOOKBACK_DAYS,
) -> tuple[DataFrame, DataFrame]:
    """Pod + node assets (lib/collectPods.ts).

    Scans the union of the logs and APM sources (S4,
    lib/collectPods.ts:13) — modeled as two logical signal streams split by
    signal kind, unioned by name.
    """
    window = (now - timedelta(days=lookback_days), now)
    sig = signals_view(spark, sf_dir, ts_range=window)  # scan-level pruning
    logs = sig.filter(F.col("`metricset.name`").isin("click", "view", "error"))
    apm = sig.filter(F.col("`metricset.name`").isin("purchase", "signup"))
    both = union_scan(logs, apm)

    both = time_window(both, "@timestamp", now, lookback_days, "d")
    both = exists_all(both, "kubernetes.pod.uid", "kubernetes.node.name")  # F4 (must ×2)
    top = collapse_top1(both, "kubernetes.pod.uid", "@timestamp", tiebreak="event.id")
    top = _with_eans(top).cache()

    pods = top.select(
        F.lit(now).alias("@timestamp"),
        F.col("pod_ean").alias("asset.ean"),
        F.lit("k8s.pod").alias("asset.type"),
        F.col("`kubernetes.pod.uid`").alias("asset.id"),
        F.lit(None).cast("string").alias("asset.name"),
        F.array(F.col("node_ean")).alias("asset.parents"),  # lib/collectPods.ts:77
        F.lit(None).cast("array<string>").alias("asset.children"),
        F.lit(None).cast("array<string>").alias("asset.references"),
        F.col("`cloud.provider`").alias("cloud.provider"),
        F.col("`orchestrator.cluster.name`").alias("orchestrator.cluster.name"),
        F.lit(None).cast("string").alias("service.environment"),
    )

    # The node's cluster parent comes from the row that *creates* the node —
    # the newest pod row for that node (find-or-create in desc sort order,
    # lib/collectPods.ts:98-110).  Window top-1 per node reproduces it.
    newest_per_node = collapse_top1(
        top, "kubernetes.node.name", "@timestamp", tiebreak="event.id"
    ).select(
        F.col("`kubernetes.node.name`").alias("__node"),
        F.col("`orchestrator.cluster.name`").alias("__cluster"),
    )

    node_children = group_collect_edges(
        top,
        owner_cols=["node_ean", "kubernetes.node.name"],
        edge_cols={"asset.children": "pod_ean"},
    )
    nodes = (
        node_children.join(
            newest_per_node,
            node_children["`kubernetes.node.name`"] == newest_per_node["__node"],
            "left",
        )
        .select(
            F.lit(now).alias("@timestamp"),
            F.col("node_ean").alias("asset.ean"),
            F.lit("k8s.node").alias("asset.type"),
            F.col("`kubernetes.node.name`").alias("asset.id"),
            F.lit(None).cast("string").alias("asset.name"),
            F.when(
                F.col("__cluster").isNotNull(),
                F.array(make_ean("k8s.cluster", F.col("__cluster"))),
            ).alias("asset.parents"),
            F.col("`asset.children`"),
            F.lit(None).cast("array<string>").alias("asset.references"),
            F.lit(None).cast("string").alias("cloud.provider"),
            F.lit(None).cast("string").alias("orchestrator.cluster.name"),
            F.lit(None).cast("string").alias("service.environment"),
        )
    )
    return pods, nodes
