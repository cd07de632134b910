"""Sources: named tables → DataFrames (reference S1-S4).

Reference equivalents:
  * S1 ES index scan   (lib/es_client.ts:25-27)  → ``spark.read.parquet``
  * S2 index patterns  (constants.ts:1-2)        → per-table paths/globs
  * S4 multi-source union scan (lib/collectPods.ts:13, one query over
    ``[logsIndices, apmIndices]``) → ``unionByName(allowMissingColumns)``

Scale notes: the parquet scan is the pushdown boundary — filters and
column pruning land here (verify with ``df.explain``: ``PushedFilters``,
``ReadSchema``).  Timestamp normalization happens once at this boundary so
every downstream operator sees proper TimestampType.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Load one named table, normalizing nanosecond timestamps.

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS); with
    ``spark.sql.legacy.parquet.nanosAsLong`` it arrives as a ns-epoch long
    and is truncated to microseconds here (integer floor-division, the same
    ns→µs conversion DuckDB applies), so Spark and the oracle agree.
    """
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    if table == "events" and dict(df.dtypes).get("ts") == "bigint":
        # integer division — double division loses precision at ns-epoch scale
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def union_scan(*dfs: DataFrame) -> DataFrame:
    """S4: one scan over several logical sources (lib/collectPods.ts:13).

    ``unionByName(allowMissingColumns=True)`` mirrors querying two index
    patterns whose documents carry different field sets: missing fields are
    NULL, matching the fields-API "absent field" behavior.
    """
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df, allowMissingColumns=True)
    return out
