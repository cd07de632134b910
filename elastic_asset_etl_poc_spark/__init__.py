"""elastic_asset_etl_poc_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of the reference asset-ETL POC
(``jasonrhodes/elastic-asset-etl-poc``), rebuilt Spark-first.

The reference (see ``SURVEY.md``) discovers infrastructure assets
(services, containers, k8s pods/nodes) from observability signals and
links them into a parent/child/reference graph.  This package re-expresses
that capability — plus the large-scale training-data-pipeline operators a
100 TB deployment needs (dedup, similarity search, text analysis) — as
declarative DataFrame plans that Catalyst can optimize: predicate/projection
pushdown to the Parquet scan, broadcast semi-joins for IN-list phases,
hash aggregation for dedup/graph-collect, zero row-at-a-time Python UDFs.

Layout (SURVEY.md §7):
    session.py    — tuned SparkSession factory (S5/S6)
    config.py     — named-source catalog + env switch (S3/S10)
    schema.py     — SimpleAsset output schema (S7, types.ts:1-13)
    sources/      — named sources, union scans, signal derivation (S1-S4)
    functions/    — scalar column builders: EAN, parent cascade (X1-X7)
    operators/    — df→df operators: filters, dedup, joins, graph, text,
                    similarity (§2 inventory + extensions)
    plans/        — the reference's three pipelines composed from operators
    streaming/    — Structured Streaming phrasing of phase 1 (§2.9)
    sinks.py      — parquet/json writers (S8/S9)
"""

__version__ = "0.1.0"
