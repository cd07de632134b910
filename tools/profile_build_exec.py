#!/usr/bin/env python3
"""Profile every suite query: split wall time into BUILD (the Python
fn(spark, sf_dir) call — plan construction, py4j traffic, any eager
driver work the query does on build) vs EXEC (the noop write of the
returned frame).  Same alphabetical order, warmup and clearCache
discipline as bench.py, single run per query by default.

Usage: python tools/profile_build_exec.py [out.json] [substr ...]
  With substr args, only queries whose name contains one of them run.

Output JSON: {name: {"build": s, "exec": s, "total": s}} plus "_meta".
This is a diagnostic tool (guide §1: measure first) — it changes no
query and writes nothing under testdata.
"""
from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_PURE_DECODE", "1")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/profile_build_exec.json"
    subs = sys.argv[2:]
    runs = max(1, int(os.environ.get("SPARK_GRAFT_PROFILE_RUNS", "1")))

    import __spark_entry__ as e
    from elastic_asset_etl_poc_spark.session import get_spark
    from elastic_asset_etl_poc_spark.sources.registry import TABLES, load_table

    spark = get_spark(app_name="profile_build_exec")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for t in TABLES:
        try:
            load_table(spark, sf_dir, t).count()
        except Exception:
            pass

    qs = dict(sorted(e.queries().items()))
    if subs:
        qs = {k: v for k, v in qs.items() if any(s in k for s in subs)}
    prof: dict[str, dict] = {}
    t_suite0 = time.perf_counter()
    for name, fn in qs.items():
        builds, execs = [], []
        for _ in range(runs):
            try:
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                t1 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                t2 = time.perf_counter()
                builds.append(t1 - t0)
                execs.append(t2 - t1)
            except Exception as ex:  # noqa: BLE001
                print(f"profile error in {name}: {ex}", file=sys.stderr)
                break
            finally:
                spark.catalog.clearCache()
        if builds:
            b, x = min(builds), min(execs)
            prof[name] = {
                "build": round(b, 3),
                "exec": round(x, 3),
                "total": round(b + x, 3),
            }
        else:
            prof[name] = {"build": -1.0, "exec": -1.0, "total": -1.0}
    prof["_meta"] = {
        "sf_dir": sf_dir,
        "runs": runs,
        "wall": round(time.perf_counter() - t_suite0, 1),
        "load1_end": round(os.getloadavg()[0], 2),
    }
    with open(out_path, "w") as fh:
        json.dump(prof, fh, indent=1, sort_keys=True)
    tb = sum(v["build"] for k, v in prof.items() if k != "_meta" and v["build"] > 0)
    tx = sum(v["exec"] for k, v in prof.items() if k != "_meta" and v["exec"] > 0)
    print(f"queries={len(prof)-1} build_total={tb:.1f}s exec_total={tx:.1f}s")
    spark.stop()


if __name__ == "__main__":
    main()
