"""Unit/property tests for operators/sketches.py (portable HLL/CMS)
and the round-11 stats additions (Mann-Whitney U, BH-FDR)."""

import pyspark.sql.functions as F
import pytest

from elastic_asset_etl_poc_spark.operators.sketches import (
    cms_cells,
    cms_estimate,
    hll_estimate,
    hll_merge,
    hll_registers,
)
from elastic_asset_etl_poc_spark.operators.stats import bh_fdr, mann_whitney_u


def test_hll_accuracy_bound(spark):
    """At m=1024 the one-sigma bound is 1.04/sqrt(1024) ~ 3.25%; assert
    the estimate on 5000 distinct keys lands within 4 sigma."""
    df = spark.range(5000).select(F.col("id").alias("k"), F.lit("g").alias("g"))
    est = hll_estimate(hll_registers(df, ["g"], "k"), ["g"]).collect()[0]
    assert abs(est["hll_estimate"] - 5000) / 5000 < 0.13


def test_hll_duplicates_dont_move_estimate(spark):
    """Cardinality, not frequency: replaying every key 7x must leave
    every register (max of per-key rhos) and hence the estimate
    bit-identical."""
    base = spark.range(800).select(F.col("id").alias("k"), F.lit("g").alias("g"))
    dup = base.union(base).union(base.union(base)).union(base.union(base)).union(base)
    e1 = hll_estimate(hll_registers(base, ["g"], "k"), ["g"]).collect()[0]
    e2 = hll_estimate(hll_registers(dup, ["g"], "k"), ["g"]).collect()[0]
    assert e1["hll_estimate"] == e2["hll_estimate"]


def test_hll_merge_equals_direct(spark):
    """max-merging two disjoint groups' registers must equal sketching
    their union directly — the mergeability contract."""
    a = spark.range(0, 1500).select(F.col("id").alias("k"), F.lit("a").alias("g"))
    b = spark.range(1000, 2500).select(F.col("id").alias("k"), F.lit("b").alias("g"))
    regs = hll_registers(a.union(b), ["g"], "k")
    merged = hll_estimate(
        hll_merge(regs.withColumn("u", F.lit("u")), ["u"]), ["u"]
    ).collect()[0]["hll_estimate"]
    direct = hll_estimate(
        hll_registers(
            a.union(b).select("k").withColumn("u", F.lit("u")), ["u"], "k"
        ),
        ["u"],
    ).collect()[0]["hll_estimate"]
    assert merged == direct


def test_cms_never_undercounts_and_bounds_error(spark):
    """CMS one-sided guarantee: estimate >= exact for EVERY key; and
    with w=2048 cells per row, total overcount stays small on a 20k-row
    / 500-key stream."""
    df = spark.range(20000).select((F.col("id") % 500).alias("k"))
    cells = cms_cells(df, "k")
    exact = df.groupBy("k").agg(F.count(F.lit(1)).alias("n_exact"))
    est = cms_estimate(cells, exact.select("k"), "k")
    rows = est.join(exact, "k").collect()
    assert len(rows) == 500
    assert all(r["cms_estimate"] >= r["n_exact"] for r in rows)
    # eps = e/w ~ 0.0013 -> per-key error well under eps*N with slack 4x
    assert all(
        r["cms_estimate"] - r["n_exact"] <= 4 * 2.72 / 2048 * 20000
        for r in rows
    )


def test_mann_whitney_hand_computed(spark):
    """A=[1,2,3] vs B=[2,3,4]: U_A = 2 (rank-sum 8 minus 6), tie groups
    {2},{3} give Sum(t^3-t)=12, var = 0.75*(7 - 12/30) = 4.95,
    z = -2.5/sqrt(4.95) = -1.1236."""
    rows = [(1.0, "a"), (2.0, "a"), (3.0, "a"), (2.0, "b"), (3.0, "b"), (4.0, "b")]
    df = spark.createDataFrame(rows, ["v", "side"])
    r = mann_whitney_u(
        df, "v", F.col("side") == "a", F.col("side") == "b"
    ).collect()[0]
    assert (r["n_a"], r["n_b"]) == (3, 3)
    assert r["u_stat"] == pytest.approx(2.0)
    assert r["z"] == pytest.approx(-1.123666, abs=1e-5)
    assert r["significant"] == 0


def test_mann_whitney_separated_samples(spark):
    """Fully separated samples: U_A = na*nb (every a > every b),
    z significant."""
    rows = [(float(100 + i), "a") for i in range(30)] + [
        (float(i), "b") for i in range(30)
    ]
    df = spark.createDataFrame(rows, ["v", "side"])
    r = mann_whitney_u(
        df, "v", F.col("side") == "a", F.col("side") == "b"
    ).collect()[0]
    assert r["u_stat"] == pytest.approx(900.0)
    assert r["significant"] == 1


def test_bh_fdr_step_up_rule(spark):
    """The step-up subtlety: p=[.01,.03,.035,.04] at q=.05 rejects ALL
    FOUR because rank 4 passes (.04 <= .05) even though rank 2 fails
    (.03 > .025) — a step-down implementation gets this wrong."""
    df = spark.createDataFrame(
        [("h1", 0.01), ("h2", 0.03), ("h3", 0.035), ("h4", 0.04)],
        ["h", "p"],
    )
    out = {r["h"]: r["rejected"] for r in bh_fdr(df, "h", "p").collect()}
    assert out == {"h1": 1, "h2": 1, "h3": 1, "h4": 1}


def test_bh_fdr_partial_and_null(spark):
    """p=[.01,.02,.04,.5]: k=2, reject exactly the two smallest; NULL
    p-values are excluded from m and reported unrejected."""
    df = spark.createDataFrame(
        [("h1", 0.01), ("h2", 0.02), ("h3", 0.04), ("h4", 0.5), ("h5", None)],
        ["h", "p"],
    )
    rows = {r["h"]: r for r in bh_fdr(df, "h", "p").collect()}
    assert [rows[h]["rejected"] for h in ("h1", "h2", "h3", "h4", "h5")] == [
        1, 1, 0, 0, 0,
    ]
    assert rows["h5"]["bh_rank"] is None
    # m excludes the NULL: rank-1 threshold is q/4, not q/5
    assert rows["h1"]["bh_thresh"] == pytest.approx(0.05 / 4)


def test_ks_identical_samples_zero(spark):
    """KS of a sample against itself is 0 and never significant."""
    from elastic_asset_etl_poc_spark.operators.stats import ks_test

    base = spark.range(500).select((F.col("id") % 37 * 1.5).alias("v"))
    df = base.withColumn("g", F.lit(0)).union(base.withColumn("g", F.lit(1)))
    r = ks_test(df, "v", F.col("g") == 0, F.col("g") == 1).collect()[0]
    assert r["ks_stat"] == pytest.approx(0.0, abs=1e-12)
    assert r["significant"] == 0


def test_ks_disjoint_supports_one(spark):
    """Fully separated samples: D = 1, significant."""
    from elastic_asset_etl_poc_spark.operators.stats import ks_test

    rows = [(float(i), "a") for i in range(40)] + [
        (float(100 + i), "b") for i in range(40)
    ]
    df = spark.createDataFrame(rows, ["v", "side"])
    r = ks_test(df, "v", F.col("side") == "a", F.col("side") == "b").collect()[0]
    assert r["ks_stat"] == pytest.approx(1.0)
    assert r["significant"] == 1


def test_spearman_perfect_monotone(spark):
    """y = x^3 is nonlinear but perfectly monotone: rho = 1; reversing
    sign gives -1 — the property Pearson-on-values fails."""
    from elastic_asset_etl_poc_spark.operators.stats import spearman_corr

    rows = [(float(i), float(i) ** 3) for i in range(1, 60)]
    df = spark.createDataFrame(rows, ["x", "y"])
    assert spearman_corr(df, "x", "y").collect()[0]["rho"] == pytest.approx(1.0)
    df2 = spark.createDataFrame([(x, -y) for x, y in rows], ["x", "y"])
    assert spearman_corr(df2, "x", "y").collect()[0]["rho"] == pytest.approx(-1.0)


def test_spearman_ties_average_rank(spark):
    """Hand-computed with ties: x=[1,1,2], y=[3,5,5].
    rx=[1.5,1.5,3], ry=[1,2.5,2.5]; rho = (3*16.75-6*6)/
    (sqrt(3*13.5-36)*sqrt(3*13.5-36)) = 14.25/16.5? -> compute:
    sx=6, sy=6, sxy=1.5*1+1.5*2.5+3*2.5=12.75, sxx=1.5^2*2+9=13.5,
    syy=1+6.25+6.25=13.5; rho=(3*12.75-36)/(3*13.5-36)=2.25/4.5=0.5."""
    from elastic_asset_etl_poc_spark.operators.stats import spearman_corr

    df = spark.createDataFrame(
        [(1.0, 3.0), (1.0, 5.0), (2.0, 5.0)], ["x", "y"]
    )
    assert spearman_corr(df, "x", "y").collect()[0]["rho"] == pytest.approx(0.5)


def test_kmins_merge_equals_direct(spark):
    """min-merging per-group k-mins samples must equal sketching the
    union directly — the mergeability contract (bucket minimum of a
    union is the min of the parts' minima), the quantile sibling of
    test_hll_merge_equals_direct."""
    from elastic_asset_etl_poc_spark.operators.sketches import (
        kmins_merge,
        kmins_sample,
    )

    a = spark.range(0, 3000).select(
        F.col("id").alias("k"),
        (F.col("id") * 1.5).alias("v"),
        F.lit("a").alias("g"),
    )
    b = spark.range(3000, 6000).select(
        F.col("id").alias("k"),
        (F.col("id") * 1.5).alias("v"),
        F.lit("b").alias("g"),
    )
    per_group = kmins_sample(a.union(b), ["g"], "k", "v", k=256)
    merged = {
        (r.idx, r.hh, r.v)
        for r in kmins_merge(
            per_group.withColumn("u", F.lit("u")), ["u"]
        ).collect()
    }
    direct = {
        (r.idx, r.hh, r.v)
        for r in kmins_sample(
            a.union(b).withColumn("u", F.lit("u")), ["u"], "k", "v", k=256
        ).collect()
    }
    assert merged == direct


def test_kmins_sample_partition_invariant(spark):
    """The struct-min build must be identical under any partitioning —
    the property that lets per-partition sketches merge exactly."""
    from elastic_asset_etl_poc_spark.operators.sketches import kmins_sample

    base = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") % 97 * 0.25).alias("v")
    ).withColumn("g", F.lit("x"))
    s3 = {
        (r.idx, r.hh, r.v)
        for r in kmins_sample(base.repartition(3), ["g"], "k", "v").collect()
    }
    s17 = {
        (r.idx, r.hh, r.v)
        for r in kmins_sample(base.repartition(17), ["g"], "k", "v").collect()
    }
    assert s3 == s17


def test_kmins_quantiles_within_rank_bound(spark):
    """On 20k uniform values, every k=1024 estimate must land within
    the 5% rank bound the suite query audits (Hoeffding tail ~1e-22 —
    a failure here is a build bug, not bad luck)."""
    from elastic_asset_etl_poc_spark.operators.sketches import (
        kmins_quantiles,
        kmins_sample,
    )

    n = 20_000
    base = spark.range(0, n).select(
        F.col("id").alias("k"),
        (F.col("id").cast("double")).alias("v"),
        F.lit("x").alias("g"),
    )
    sample = kmins_sample(base, ["g"], "k", "v")
    for r in kmins_quantiles(sample, ["g"]).collect():
        p = r.p_permille / 1000.0
        rank_frac = (r.q_est + 1) / n  # v == id: exact rank is v+1
        assert abs(rank_frac - p) <= 0.05 + 1.0 / r.m_sample, (
            r.p_permille,
            r.q_est,
            rank_frac,
        )
        assert r.m_sample <= 1024


def test_kmv_overlap_exact_when_sets_fit_in_k(spark):
    """With every set smaller than k the sketch IS the set, so j_est
    must equal the exact Jaccard for every pair (k_eff = |A∪B|)."""
    from elastic_asset_etl_poc_spark.operators.sketches import kmv_overlap

    rows = (
        [("A", i) for i in range(0, 60)]
        + [("B", i) for i in range(30, 90)]  # J(A,B)=30/90
        + [("C", i) for i in range(200, 260)]  # disjoint from A and B
    )
    df = spark.createDataFrame(rows, ["s", "k"]).repartition(4)
    got = {
        (r.set_a, r.set_b): (r.k_eff, r.j_est)
        for r in kmv_overlap(df, "s", "k", k=1024).collect()
    }
    assert got[("A", "B")] == (90, round(30 / 90, 6))
    assert got[("A", "C")] == (120, 0.0)
    assert got[("B", "C")] == (120, 0.0)


def test_kmv_overlap_estimate_within_sigma_bound(spark):
    """Large overlapping sets: the estimate must land within 5σ of the
    true Jaccard (σ = √(J(1−J)/k) — a miss is a build bug)."""
    from elastic_asset_etl_poc_spark.operators.sketches import kmv_overlap

    n, ov = 8000, 2000  # J = 2000 / 14000
    rows = [("A", i) for i in range(0, n)] + [
        ("B", i) for i in range(n - ov, 2 * n - ov)
    ]
    df = spark.createDataFrame(rows, ["s", "k"]).repartition(8)
    r = kmv_overlap(df, "s", "k", k=1024).collect()[0]
    j_true = ov / (2 * n - ov)
    sigma = (j_true * (1 - j_true) / 1024) ** 0.5
    assert r.k_eff == 1024
    assert abs(r.j_est - j_true) <= 5 * sigma, (r.j_est, j_true)


def test_kmv_merge_equals_direct_sketch(spark):
    """Sketch two halves of a set separately, merge, and the merged
    signature must be row-identical to sketching the whole set — the
    union-mergeability contract per-ingest-batch pipelines rely on."""
    from elastic_asset_etl_poc_spark.operators.sketches import (
        kmv_merge,
        kmv_sketch,
    )

    whole = spark.createDataFrame(
        [("A", i) for i in range(4000)], ["s", "k"]
    )
    h1 = whole.filter(F.col("k") < 1500)  # uneven, overlapping split
    h2 = whole.filter(F.col("k") >= 1200)
    direct = {
        (r.set_id, r.h) for r in kmv_sketch(whole, "s", "k", k=256).collect()
    }
    merged = {
        (r.set_id, r.h)
        for r in kmv_merge(
            kmv_sketch(h1, "s", "k", k=256).unionByName(
                kmv_sketch(h2, "s", "k", k=256)
            ),
            k=256,
        ).collect()
    }
    assert merged == direct and len(direct) == 256


def test_kmv_bucketed_minima_duplicate_idempotent_and_near_exact(spark):
    """The streaming pre-reduction contract: (1) duplicate (set, key)
    rows change nothing (min is idempotent — why the stream needs no
    distinct); (2) the bottom-k of the bucketed minima loses only
    same-set bucket collisions vs the exact bottom-k — a few of k at
    the birthday bound, never a different hash value ordering."""
    from elastic_asset_etl_poc_spark.operators.sketches import (
        kmv_bucketed_minima,
        kmv_sketch,
    )

    base = [("A", i) for i in range(5000)]
    df = spark.createDataFrame(base, ["s", "k"]).repartition(4)
    dup = spark.createDataFrame(base * 2, ["s", "k"]).repartition(7)

    def bottom_k(minima, k=256):
        rows = sorted(r.h for r in minima.collect())
        return rows[:k]

    m1 = bottom_k(kmv_bucketed_minima(df, "s", "k", n_buckets=4096))
    m2 = bottom_k(kmv_bucketed_minima(dup, "s", "k", n_buckets=4096))
    assert m1 == m2  # duplicates absorbed
    exact = sorted(r.h for r in kmv_sketch(df, "s", "k", k=256).collect())
    # losses only: every bucketed survivor is a true member, and the
    # overlap misses at most ~k^2/(2B) = 8 expected (assert 5x slack)
    assert set(m1) <= set(sorted(r.h for r in kmv_sketch(df, "s", "k", k=5000).collect()))
    assert len(set(exact) - set(m1)) <= 40


def test_kmv_membership_counts_exact_when_sets_fit_in_k(spark):
    """With sets ≤ k the union sample IS the union, so the raw
    membership counts give EXACT containment: n_inter/n_a = |A∩B|/|A|
    (the theta-sketch containment surface kmv_containment_sources
    estimates at scale)."""
    from elastic_asset_etl_poc_spark.operators.sketches import kmv_overlap

    rows = (
        [("A", i) for i in range(0, 40)]
        + [("B", i) for i in range(0, 100)]  # A fully inside B
    )
    df = spark.createDataFrame(rows, ["s", "k"]).repartition(3)
    r = kmv_overlap(df, "s", "k", k=1024).collect()[0]
    assert (r.n_a, r.n_b, r.n_inter) == (40, 100, 40)
    assert r.n_inter / r.n_a == 1.0  # containment A in B
    assert r.n_inter / r.n_b == 0.4
    assert r.j_est == 0.4  # J = 40/100


def test_kmv_candidate_pairs_prunes_disjoint(spark):
    """The large-S candidate generator: overlapping pairs share
    ~k·containment sampled hashes, disjoint pairs share none — so a
    modest min_shared keeps the true pair and drops the quadratic
    bulk.  Sets here fit in k, making expectations exact."""
    from elastic_asset_etl_poc_spark.operators.sketches import (
        kmv_candidate_pairs,
        kmv_overlap_from_sketch,
        kmv_sketch,
    )

    rows = (
        [("A", i) for i in range(0, 600)]
        + [("B", i) for i in range(300, 900)]  # |A∩B| = 300
        + [("C", i) for i in range(5000, 5600)]  # disjoint
    )
    df = spark.createDataFrame(rows, ["s", "k"]).repartition(4)
    sig = kmv_sketch(df, "s", "k", k=1024)
    cand = {
        (r.set_a, r.set_b, r.n_shared)
        for r in kmv_candidate_pairs(sig, min_shared=10).collect()
    }
    assert cand == {("A", "B", 300)}  # sets ≤ k → n_shared exact
    est = kmv_overlap_from_sketch(
        sig, k=1024, pairs=kmv_candidate_pairs(sig, min_shared=10)
    ).collect()
    assert len(est) == 1 and est[0].j_est == round(300 / 900, 6)


def test_kmv_min_shared_bound_retains_above_drops_below(spark):
    """The operator-derived t→min_shared bound keeps pairs with J ≥ t
    and drops pairs with J well below it, on sets large enough that
    the sketch actually samples (|union| > k).  Also pins the
    documented k=1024/t=0.1/99% value (53) and the argument contract
    (exactly one of min_shared / threshold_jaccard)."""
    import pytest

    from elastic_asset_etl_poc_spark.operators.sketches import (
        kmv_candidate_pairs,
        kmv_min_shared,
        kmv_sketch,
    )

    assert kmv_min_shared(1024, 0.1) == 53
    assert kmv_min_shared(1024, 0.5, retention=0.999) == 452  # ⌊512-59.5⌋
    assert kmv_min_shared(16, 0.01) == 1  # floor at 1

    # A∩B: J = 2000/6000 = 0.333 (>= t); A∩C: J = 100/7900 ≈ 0.0127 (<< t)
    rows = (
        [("A", i) for i in range(0, 4000)]
        + [("B", i) for i in range(2000, 6000)]
        + [("C", i) for i in range(3900, 7900)]
    )
    df = spark.createDataFrame(rows, ["s", "k"]).repartition(4)
    sig = kmv_sketch(df, "s", "k", k=1024)
    t = 0.1
    cand = {
        (r.set_a, r.set_b)
        for r in kmv_candidate_pairs(sig, threshold_jaccard=t, k=1024).collect()
    }
    assert ("A", "B") in cand  # J = 0.333 >= t: retained
    assert ("A", "C") not in cand  # J ≈ 0.013 << t: pruned
    # B∩C: J = 2100/5900 ≈ 0.356 >= t: retained
    assert ("B", "C") in cand

    with pytest.raises(ValueError):
        kmv_candidate_pairs(sig)
    with pytest.raises(ValueError):
        kmv_candidate_pairs(sig, min_shared=5, threshold_jaccard=0.1)


def test_kmv_candidate_pairs_underfull_clamp(spark):
    """Retention soundness at LOW occupancy: when |A∪B| ≤ k the
    sketch is exact and n_shared = |A∩B| deterministically, which can
    sit below the FULL-sketch Hoeffding literal for a J ≥ t pair —
    the r14 bound would drop it with probability 1, not ≤ 1−retention.
    The per-pair clamp (threshold evaluated at k_eff = max sketch row
    count) must retain it.  Pinned example (ADVICE r14):
    |A| = |B| = 224, |A∩B| = 48, |A∪B| = 400 → J = 0.12 ≥ t = 0.1 but
    n_shared = 48 < 53 = ⌊1024·0.1 − √(1024·ln100/2)⌋; clamped
    threshold at k_eff = 224 is max(1, ⌊22.4 − 22.7⌋) = 1 → kept."""
    from elastic_asset_etl_poc_spark.operators.sketches import (
        kmv_candidate_pairs,
        kmv_min_shared,
        kmv_sketch,
    )

    # the full-sketch literal really is above this pair's exact count
    assert kmv_min_shared(1024, 0.1) == 53
    # and the clamped bound at the pair's effective size is permissive
    assert kmv_min_shared(224, 0.1) == 1

    rows = (
        [("A", i) for i in range(0, 224)]
        + [("B", i) for i in range(176, 400)]  # |A∩B| = 48
        + [("C", i) for i in range(9000, 9224)]  # disjoint
    )
    df = spark.createDataFrame(rows, ["s", "k"]).repartition(4)
    sig = kmv_sketch(df, "s", "k", k=1024)
    cand = {
        (r.set_a, r.set_b, r.n_shared)
        for r in kmv_candidate_pairs(
            sig, threshold_jaccard=0.1, k=1024
        ).collect()
    }
    # exact under-full pair retained with its exact intersection count;
    # the raw-literal path still drops it (caller-owned bound honored)
    assert cand == {("A", "B", 48)}
    raw = {
        (r.set_a, r.set_b)
        for r in kmv_candidate_pairs(sig, min_shared=53).collect()
    }
    assert raw == set()
