"""Mock-Elasticsearch DataSource with Query-DSL filter pushdown.

SURVEY.md §4: attaching a live ES source needs a DataSourceV2 with
``SupportsPushDownFilters`` mapping Spark filters back onto the Query DSL
(``range``/``term``/``terms``/``exists``) — the exact *inverse* of the
reference's server-side query building (§2.2).  This module implements
that contract with Spark 4's Python Data Source API against a directory
of JSON-lines "indices" (the container has no live ES; the pushdown
surface, DSL translation, and partition model are the real deliverable —
swapping the line reader for an ES scroll client changes nothing above
`read()`).

Pushdown mapping (the §2.2 table, inverted):
    EqualTo(f, v)           → {"term":  {f: {"value": v}}}           (F2)
    In(f, vs)               → {"terms": {f: [...]}}                   (F3)
    IsNotNull(f)            → {"exists": {"field": f}}                (F4)
    GreaterThan[OrEqual]/LessThan[OrEqual] → {"range": {f: {...}}}    (F1)
Anything else is left for Spark to evaluate (pushFilters returns it).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql.types import StructType


def filters_to_dsl(filters: list[Filter]) -> tuple[dict, list[Filter]]:
    """Translate Spark filters into an ES ``bool.filter`` clause list.

    Returns (dsl, unsupported).  Attribute paths join with '.' — dotted
    flattened names, exactly the reference's field addressing.
    """
    clauses: list[dict] = []
    unsupported: list[Filter] = []
    for f in filters:
        col = ".".join(f.attribute) if hasattr(f, "attribute") else None
        if isinstance(f, EqualTo):
            clauses.append({"term": {col: {"value": f.value}}})
        elif isinstance(f, In):
            clauses.append({"terms": {col: list(f.value)}})
        elif isinstance(f, IsNotNull):
            clauses.append({"exists": {"field": col}})
        elif isinstance(f, GreaterThan):
            clauses.append({"range": {col: {"gt": f.value}}})
        elif isinstance(f, GreaterThanOrEqual):
            clauses.append({"range": {col: {"gte": f.value}}})
        elif isinstance(f, LessThan):
            clauses.append({"range": {col: {"lt": f.value}}})
        elif isinstance(f, LessThanOrEqual):
            clauses.append({"range": {col: {"lte": f.value}}})
        else:
            unsupported.append(f)
    return {"bool": {"filter": clauses}}, unsupported


def _matches(doc: dict, dsl: dict) -> bool:
    """Server-side evaluation of the pushed DSL (ES filter-context
    semantics: missing field fails term/terms/range/exists)."""
    for clause in dsl.get("bool", {}).get("filter", []):
        if "term" in clause:
            ((col, spec),) = clause["term"].items()
            if doc.get(col) != spec["value"]:
                return False
        elif "terms" in clause:
            ((col, values),) = clause["terms"].items()
            if doc.get(col) not in values:
                return False
        elif "exists" in clause:
            if doc.get(clause["exists"]["field"]) is None:
                return False
        elif "range" in clause:
            ((col, spec),) = clause["range"].items()
            v = doc.get(col)
            if v is None:
                return False
            if "gt" in spec and not v > spec["gt"]:
                return False
            if "gte" in spec and not v >= spec["gte"]:
                return False
            if "lt" in spec and not v < spec["lt"]:
                return False
            if "lte" in spec and not v <= spec["lte"]:
                return False
    return True


@dataclass
class _ShardPartition(InputPartition):
    path: str


class SignalsESReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.options = options
        self.dsl: dict = {"bool": {"filter": []}}

    def pushFilters(self, filters: list[Filter]):  # noqa: N802 (API name)
        self.dsl, unsupported = filters_to_dsl(filters)
        yield from unsupported

    def partitions(self):
        root = self.options["path"]
        # one partition per shard file — the ES slice/shard parallelism model
        return [
            _ShardPartition(os.path.join(root, f))
            for f in sorted(os.listdir(root))
            if f.endswith(".jsonl")
        ]

    def read(self, partition: _ShardPartition) -> Iterator[tuple]:
        if partition is None:  # empty index: Spark calls read(None) once
            return
        names = self.schema.fieldNames()
        with open(partition.path) as fh:
            for line in fh:
                doc = json.loads(line)
                if _matches(doc, self.dsl):
                    yield tuple(doc.get(n) for n in names)


class SignalsESDataSource(DataSource):
    """``spark.read.format("signals_es").schema(...).option("path", dir)``"""

    @classmethod
    def name(cls) -> str:
        return "signals_es"

    def schema(self) -> str:
        # default signal-document schema; callers usually pass .schema(...)
        return "event_id bigint, ts bigint, service_name string, metricset_name string, container_id string"

    def reader(self, schema: StructType) -> SignalsESReader:
        return SignalsESReader(schema, dict(self.options))


def register(spark) -> None:
    spark.dataSource.register(SignalsESDataSource)
