#!/usr/bin/env python3
"""Record each lazy batch query's physical-plan shape into
tests/plan_budget.json: shuffle-exchange count, broadcast count,
cartesian products, and Python-eval operators.

tests/test_plan_budget.py asserts the CURRENT plans stay within these
budgets, so a shuffle sneaking into any query (the regression class the
hand-written asserts in test_plans_physical.py catch one-by-one) fails
mechanically for every budgeted query at once.

Regenerate ONLY after reviewing a diff: a higher number must be a
deliberate trade, not drift.  Usage: python3 tools/gen_plan_budget.py
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

# Eager builders are excluded: streaming queries execute on build, and
# localCheckpoint/collect-based chains (dedup/ANN/audit family) truncate
# their visible lineage, so a plan budget would measure the tail only.
EXCLUDE_SUBSTRINGS = (
    "stream",
    "recall_",
    "dedup_",
    "jaccard",
    "minhash",
    "simhash",
    "contamination",
    "ivf",
    "knn",
    "neardup",
    "cluster_docs",
    "multimodal",
    "pagerank",          # iterative: per-round checkpoints truncate lineage
    "cluster_split",     # dedup_survivors collects pairs at build time
    "audit_split_leakage",
    "pretrain_pipeline",  # mid-plan localCheckpoint truncates lineage
    "train_classifier",   # eager gradient loop: result is a 65-row
                          # createDataFrame, the training plan is per-step
    "entity_clusters",    # dedup_survivors collects the pair set at
                          # build time (driver union-find fast path)
    "bucketed_join",      # writes bucketed tables at build time and
                          # returns a localCheckpoint (plan is the tail;
                          # the no-Exchange join shape self-audits
                          # in-query and in tests/test_scale_ops.py)
)

SF_DIR = "/root/testdata/sf0.001"


def plan_counts(df) -> dict[str, int]:
    spark = df.sparkSession
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    lines = [l.strip() for l in plan.splitlines()]

    def n(node: str) -> int:
        return sum(1 for l in lines if l.startswith("(") and f") {node}" in l)

    return {
        "shuffle_exchanges": n("Exchange"),
        "broadcasts": n("BroadcastExchange"),
        "cartesian": n("CartesianProduct"),
        "python_eval": sum(1 for l in lines if "BatchEvalPython" in l),
    }


def main() -> None:
    import __spark_entry__ as e
    from elastic_asset_etl_poc_spark.session import get_spark

    spark = get_spark(master="local[8]")
    budget: dict[str, dict[str, int]] = {}
    for name, fn in e.queries().items():
        if any(s in name for s in EXCLUDE_SUBSTRINGS):
            continue
        budget[name] = plan_counts(fn(spark, SF_DIR))
    with open("/root/repo/tests/plan_budget.json", "w") as fh:
        json.dump(budget, fh, indent=1, sort_keys=True)
    print(f"budgeted {len(budget)} queries")
    spark.stop()


if __name__ == "__main__":
    main()
