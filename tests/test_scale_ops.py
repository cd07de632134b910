"""Scale-technique tests: salting and bucketing actually change the plan
the way the 100 TB design claims."""

from pyspark.sql import functions as F

from conftest import SF_DIR

from elastic_asset_etl_poc_spark.operators.skew import salted_agg, salted_join
from elastic_asset_etl_poc_spark.sources.registry import load_table


def test_salted_agg_matches_direct(spark):
    l = load_table(spark, SF_DIR, "lineitem")
    direct = {
        r.l_returnflag: (r.n, r.s)
        for r in l.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("s"))
        .collect()
    }
    salted = {
        r.l_returnflag: (r.n, r.s)
        for r in salted_agg(
            l,
            ["l_returnflag"],
            {"n": ("count", "l_quantity"), "s": ("sum", "l_quantity")},
            salt_col="l_orderkey",
        ).collect()
    }
    assert salted == direct


def test_salted_join_matches_direct(spark):
    o = load_table(spark, SF_DIR, "orders").select("o_custkey", "o_orderkey")
    c = load_table(spark, SF_DIR, "customer").select("c_custkey", "c_name")
    c = c.withColumnRenamed("c_custkey", "o_custkey")
    direct = o.join(c, "o_custkey").count()
    salted = salted_join(o, c, "o_custkey").count()
    assert salted == direct


def test_salted_join_deterministic_routing(spark):
    """Salt derives from row content only: repartitioning the input must
    not change the joined result (monotonically_increasing_id would)."""
    o = load_table(spark, SF_DIR, "orders").select("o_custkey", "o_orderkey")
    c = load_table(spark, SF_DIR, "customer").select("c_custkey", "c_name")
    c = c.withColumnRenamed("c_custkey", "o_custkey")
    base = sorted(map(tuple, salted_join(o, c, "o_custkey").collect()))
    repart = sorted(map(tuple, salted_join(o.repartition(13), c, "o_custkey").collect()))
    assert base == repart


def test_salted_join_rejects_right_outer(spark):
    import pytest

    o = load_table(spark, SF_DIR, "orders").select("o_custkey")
    c = load_table(spark, SF_DIR, "customer").select(
        F.col("c_custkey").alias("o_custkey")
    )
    for how in ("right", "outer", "full"):
        with pytest.raises(ValueError, match="salted_join"):
            salted_join(o, c, "o_custkey", how=how)


def test_bucketed_join_has_no_exchange(spark):
    from elastic_asset_etl_poc_spark.sinks import write_bucketed

    o = load_table(spark, SF_DIR, "orders")
    l = load_table(spark, SF_DIR, "lineitem")
    try:
        write_bucketed(o.select("o_orderkey", "o_totalprice"), "b_orders", ["o_orderkey"], 8)
        write_bucketed(
            l.select("l_orderkey", "l_quantity"), "b_lineitem", ["l_orderkey"], 8
        )
        bo = spark.table("b_orders")
        bl = spark.table("b_lineitem")
        joined = bl.join(bo, bl["l_orderkey"] == bo["o_orderkey"])
        # disable broadcast so the join strategy decision is about shuffles
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = joined._jdf.queryExecution().executedPlan().toString()
            n = joined.count()
        finally:
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
            )
        assert "Exchange hashpartitioning" not in plan  # co-located: no shuffle
        assert n == l.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_sketches_near_exact(spark):
    import __spark_entry__ as e

    qs = e.queries()
    approx = {
        r.l_returnflag: (r.approx_parts, r.approx_p50)
        for r in qs["cardinality_sketches"](spark, SF_DIR).collect()
    }
    exact_cnt = {
        r.l_returnflag: r.n_parts
        for r in qs["distinct_parts_counts"](spark, SF_DIR).collect()
    }
    exact_p50 = {
        r.l_returnflag: r.p50_price
        for r in qs["percentile_prices"](spark, SF_DIR).collect()
    }
    for k in exact_cnt:
        assert abs(approx[k][0] - exact_cnt[k]) / exact_cnt[k] < 0.05
        assert abs(approx[k][1] - exact_p50[k]) / exact_p50[k] < 0.05


def test_partitioned_write_prunes(spark, tmp_path):
    from pyspark.sql import functions as F

    ev = load_table(spark, SF_DIR, "events")
    path = str(tmp_path / "events_by_day")
    ev.withColumn("day", F.to_date("ts")).write.mode("overwrite").partitionBy(
        "day"
    ).parquet(path)
    back = spark.read.parquet(path).filter(F.col("day") == "2024-01-15")
    back.collect()
    plan = back._jdf.queryExecution().executedPlan().toString()
    # the day predicate must become a PartitionFilter (file pruning),
    # not a data filter over all files
    assert "PartitionFilters: [" in plan
    seg = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "day" in seg
    n_days = ev.select(F.to_date("ts").alias("d")).distinct().count()
    assert back.count() == ev.filter(F.to_date("ts") == "2024-01-15").count()
    assert n_days >= 25  # the store really is split into daily partitions


def test_large_large_join_smj_without_broadcast(spark):
    o = load_table(spark, SF_DIR, "orders")
    l = load_table(spark, SF_DIR, "lineitem")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        j = l.join(o, l["l_orderkey"] == o["o_orderkey"]).select(
            "l_orderkey", "o_totalprice"
        )
        n = j.count()
        plan = j._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    assert n == l.count()
    # with broadcast off, the fact-fact join must take the shuffle path
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def test_skew_report_hand_computed(spark):
    from elastic_asset_etl_poc_spark.operators.skew import skew_report

    df = spark.createDataFrame(
        [("hot",)] * 20 + [("a",)] * 2 + [("b",)], "k string"
    )
    out = skew_report(df, "k", top_n=2).collect()
    assert [(r.key, r.n_rows, r.rank) for r in out] == [("hot", 20, 1), ("a", 2, 2)]
    by = {r.key: r for r in out}
    assert by["hot"].pct_of_total == round(20 * 100.0 / 23, 4)
    assert by["hot"].hot_ratio == round(20 * 3 / 23, 4)
    # top-n must plan as TakeOrdered (distributed), not a global window
    plan = skew_report(df, "k", top_n=2)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrdered" in plan


def test_sf1_slope_gate_fails_superlinear_plant():
    """The sf1 smoke's slope gate must actually fire: a planted 6x
    slope on a linear-class query FAILS, the measured-regime slopes
    (<= 2.9x across r6-r10) PASS.  Guards the r10 judge finding that
    the old 15.0 bound would have passed a 5x superlinear regression
    unseen."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "sf1_scale_smoke",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools",
            "sf1_scale_smoke.py",
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert mod.MAX_LINEAR_SLOPE <= 5.0
    results = {
        "honest_linear": {"class": "linear", "slope": 2.9},
        "annotated_linear": {
            "class": "linear (slope ~3.5x expected: windows widen)",
            "slope": 3.5,
        },
        "quadratic_plant": {"class": "linear", "slope": 6.0},
        "allpairs_audit": {"class": "quadratic by design", "slope": 40.0},
        # second-decade creep: first decade passes (4.0x at 10x data —
        # under the 5.0 bound) but the sf1→sf3 step is superlinear
        # (6.0x at 3x data) — only the sf3 arm's slope2 gate sees it
        "decade_creep": {"class": "linear", "slope": 4.0, "slope2": 6.0},
        # genuinely sublinear decade-2 slope passes even though the
        # overhead-dominated decade-1 slope (1.6x at 10x) would make an
        # efficiency double-ratio flag it — the rejected-metric case
        "decade_ok": {"class": "linear", "slope": 1.6, "slope2": 2.2},
    }
    assert mod.MAX_LINEAR_SLOPE2 <= 4.5
    assert mod.slope_failures(results) == [
        "quadratic_plant",
        "decade_creep (slope2=6.0)",
    ]
