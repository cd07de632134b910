"""Mock-ES DataSource tests: DSL translation and end-to-end pushdown."""

import json

import pytest
from pyspark.sql.datasource import (
    EqualTo,
    GreaterThanOrEqual,
    In,
    IsNotNull,
    LessThan,
    StringContains,
)

from elastic_asset_etl_poc_spark.sources.es_source import filters_to_dsl, register


def test_filters_to_dsl_mapping():
    dsl, unsupported = filters_to_dsl(
        [
            EqualTo(("metricset_name",), "purchase"),
            In(("service_name",), ("svc-1", "svc-2")),
            IsNotNull(("container_id",)),
            GreaterThanOrEqual(("ts",), 100),
            LessThan(("ts",), 200),
            StringContains(("service_name",), "svc"),  # not DSL-mappable
        ]
    )
    clauses = dsl["bool"]["filter"]
    assert {"term": {"metricset_name": {"value": "purchase"}}} in clauses
    assert {"terms": {"service_name": ["svc-1", "svc-2"]}} in clauses
    assert {"exists": {"field": "container_id"}} in clauses
    assert {"range": {"ts": {"gte": 100}}} in clauses
    assert {"range": {"ts": {"lt": 200}}} in clauses
    assert len(unsupported) == 1 and isinstance(unsupported[0], StringContains)


@pytest.fixture(scope="module")
def es_index(tmp_path_factory):
    d = tmp_path_factory.mktemp("es_index")
    docs = [
        {"event_id": 1, "ts": 100, "service_name": "svc-1", "metricset_name": "purchase", "container_id": "c1"},
        {"event_id": 2, "ts": 150, "service_name": "svc-2", "metricset_name": "click", "container_id": None},
        {"event_id": 3, "ts": 250, "service_name": "svc-1", "metricset_name": "purchase", "container_id": None},
        {"event_id": 4, "ts": 300, "service_name": "svc-3", "metricset_name": "purchase", "container_id": "c2"},
    ]
    # two shard files → two partitions
    (d / "shard-0.jsonl").write_text("\n".join(json.dumps(x) for x in docs[:2]))
    (d / "shard-1.jsonl").write_text("\n".join(json.dumps(x) for x in docs[2:]))
    return str(d)


def test_es_source_end_to_end_pushdown(spark, es_index):
    register(spark)
    df = (
        spark.read.format("signals_es")
        .schema("event_id bigint, ts bigint, service_name string, metricset_name string, container_id string")
        .option("path", es_index)
        .load()
    )
    out = df.filter(
        (df.metricset_name == "purchase") & (df.ts >= 150) & df.container_id.isNotNull()
    )
    rows = out.collect()
    assert [r.event_id for r in rows] == [4]
    # all three predicates were consumed by the source: the executed plan
    # has NO post-scan Filter node (Python scans don't print PushedFilters)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchScan signals_es" in plan
    assert "+- Filter" not in plan and "* Filter" not in plan


def test_es_source_unsupported_filter_still_correct(spark, es_index):
    register(spark)
    df = (
        spark.read.format("signals_es")
        .schema("event_id bigint, ts bigint, service_name string, metricset_name string, container_id string")
        .option("path", es_index)
        .load()
    )
    # contains() is not DSL-mappable -> Spark must re-apply it post-scan
    out = df.filter(df.service_name.contains("svc-1") & (df.ts < 200))
    assert [r.event_id for r in out.collect()] == [1]
