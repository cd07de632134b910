"""Output schema: the SimpleAsset document (reference: types.ts:1-13).

The reference declares its output schema as an ES index template
(``lib/assets_index_template.ts:3-32``): flattened dotted field names
(``subobjects: false``), every string mapped to ``keyword`` capped at 1024
chars, ``@timestamp`` as ``date``.  Spark-side that is a fixed StructType
enforced on write (S7) — schema-on-write instead of a dynamic template.

Column names keep the reference's dotted spelling verbatim (quote with
backticks in expressions); edge lists are array<string> adjacency columns.
"""

from __future__ import annotations

from pyspark.sql import types as T

#: Max keyword length from the dynamic template (assets_index_template.ts:20).
KEYWORD_MAX_LEN = 1024

#: Asset types instantiated by the reference (lib/collectServices.ts:6-7,
#: lib/collectPods.ts:6-7) plus the cluster parent (lib/collectPods.ts:107).
ASSET_TYPES = ("service", "container", "host", "k8s.pod", "k8s.node", "k8s.cluster")

SIMPLE_ASSET_SCHEMA = T.StructType(
    [
        T.StructField("@timestamp", T.TimestampType(), False),
        T.StructField("asset.ean", T.StringType(), False),
        T.StructField("asset.type", T.StringType(), False),
        T.StructField("asset.id", T.StringType(), False),
        T.StructField("asset.name", T.StringType(), True),
        T.StructField("asset.parents", T.ArrayType(T.StringType()), True),
        T.StructField("asset.children", T.ArrayType(T.StringType()), True),
        T.StructField("asset.references", T.ArrayType(T.StringType()), True),
        T.StructField("cloud.provider", T.StringType(), True),
        T.StructField("orchestrator.cluster.name", T.StringType(), True),
        T.StructField("service.environment", T.StringType(), True),
    ]
)

ASSET_COLUMNS = [f.name for f in SIMPLE_ASSET_SCHEMA.fields]
