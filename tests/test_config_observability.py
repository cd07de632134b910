"""Catalog/env-switch (S3/S10) and error-observability (§2.11) tests."""

import pytest

from elastic_asset_etl_poc_spark.config import Catalog
from elastic_asset_etl_poc_spark.observability import run_and_print_plan_on_error


def test_catalog_cross_cluster_switch(monkeypatch):
    local = Catalog(root="/data/local", remote_root="/data/remote", cross_cluster=False)
    assert local.source_path("events") == "/data/local/events.parquet"
    ccs = Catalog(root="/data/local", remote_root="/data/remote", cross_cluster=True)
    assert ccs.source_path("events") == "/data/remote/events.parquet"
    # ES_IS_CCS env drives the default, like constants.ts:7-21
    monkeypatch.setenv("ES_IS_CCS", "true")
    assert Catalog(root="/l", remote_root="/r").source_path("t") == "/r/t.parquet"


def test_catalog_write_defaults_to_read():
    cat = Catalog(root="/data/local")
    assert cat.sink_path("assets") == "/data/local/assets"  # run.ts:36-37
    assert Catalog(root="/a", write_root="/w").sink_path("x") == "/w/x"


def test_plan_echo_on_error(spark, capsys):
    bad = spark.range(1).selectExpr("assert_true(id > 0) AS boom")  # runtime failure
    logged = []
    with pytest.raises(Exception):
        run_and_print_plan_on_error(bad, log=logged.append)
    assert any("plan echo" in m for m in logged)
    assert any("Physical Plan" in m or "Parsed Logical Plan" in m for m in logged)


def test_plan_echo_passthrough(spark):
    df = spark.range(3)
    out = run_and_print_plan_on_error(df)
    assert len(out) == 3
