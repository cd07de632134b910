"""Partition-count invariance: the distributed-correctness property the
oracle compare cannot see from one run.  A query whose result changes
with spark.sql.shuffle.partitions is nondeterministic ACROSS CLUSTER
SIZES — exactly what breaks when a plan certified on local[32] runs on
1000 executors: order-dependent float accumulation punching through the
rounding grain, window tiebreaks resolved by partition layout, top-k
ties picked by arrival order.

This sweeps a representative slice of the suite (one per determinism
risk class) at 5 and 32 shuffle partitions and requires bit-identical
normalized rows.  sf0.001 keeps it fast; the PROPERTY is scale-free.
"""

import math

import pytest

from conftest import SF_DIR

#: one per risk class: float aggregation, interpolated percentiles,
#: higher moments (catastrophic cancellation), window tiebreaks, top-k
#: ties, windowed running sums, hash-derived noise, PSI composition,
#: array aggregation order (centroids), decayed float sums.
QUERIES = [
    "agg_pricing_summary",
    "percentile_prices",
    "moments_profile_events",
    "window_latest_order",
    "join_topk_orders",
    "cusum_changepoint_events",
    "dp_noisy_counts_events",
    "drift_scorecard_events",
    "embed_drift_centroid",
    "decayed_counts_events",
    "k_anonymity_customers",
    "l_diversity_customers",
]


def _normalized(df):
    cols = sorted(df.columns)
    out = []
    for row in df.collect():
        d = row.asDict(recursive=True)
        vals = []
        for c in cols:
            v = d[c]
            if isinstance(v, float):
                vals.append("nan" if math.isnan(v) else f"{v:.6f}")
            else:
                vals.append(repr(v))
        out.append(tuple(vals))
    return sorted(out)


@pytest.mark.parametrize("name", QUERIES)
def test_partition_count_invariance(spark, name):
    import __spark_entry__ as e

    fn = e.queries()[name]
    old = spark.conf.get("spark.sql.shuffle.partitions")
    results = []
    try:
        for n in ("5", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            results.append(_normalized(fn(spark, SF_DIR)))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert results[0] == results[1], (
        f"{name}: result depends on shuffle partition count — "
        "nondeterministic across cluster sizes"
    )
