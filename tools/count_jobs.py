#!/usr/bin/env python3
"""Count the Spark JOBS one query launches end-to-end (build + noop
action) — the evidence metric for iterative-operator optimizations
whose whole point is fewer per-round actions (r17: fixpoint counts
folded into checkpoint jobs as observe metrics).  Plans cannot show
this (each round's plan is a checkpoint tail), job counts do.

Usage: python tools/count_jobs.py q1 [q2 ...]
Prints: name n_jobs wall_sec
"""
from __future__ import annotations

import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_PURE_DECODE", "1")
    import __spark_entry__ as e

    from elastic_asset_etl_poc_spark.session import get_spark

    spark = get_spark(app_name="count_jobs")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from elastic_asset_etl_poc_spark.sources.registry import TABLES, load_table

    for t in TABLES:
        load_table(spark, SF_DIR, t).count()
    qs = e.queries()
    sc = spark.sparkContext
    for name in sys.argv[1:]:
        sc.setJobGroup(name, name)
        t0 = time.perf_counter()
        qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        n = len(sc.statusTracker().getJobIdsForGroup(name))
        sc.setJobGroup(None, None)
        spark.catalog.clearCache()
        print(f"{name} jobs={n} wall={wall:.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
