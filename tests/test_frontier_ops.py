"""Unit tests for the round-11 frontier operators: skyline_2d,
bfs_khop, prefix_filter_pairs, pmi_cooccur."""

import math

import pyspark.sql.functions as F
import pytest

from elastic_asset_etl_poc_spark.operators.graph import bfs_khop
from elastic_asset_etl_poc_spark.operators.neardup import (
    jaccard_pairs,
    prefix_filter_pairs,
)
from elastic_asset_etl_poc_spark.operators.profile import skyline_2d
from elastic_asset_etl_poc_spark.operators.text import pmi_cooccur


def test_skyline_hand_computed(spark):
    """price↓/size↑ frontier: (1,5) dominates (2,5) and (1,3);
    (3,8) survives (bigger than every cheaper point); the duplicate
    of (1,5) folds into n_dup=2; (3,8) twin also counted."""
    rows = [(1.0, 5), (1.0, 5), (2.0, 5), (1.0, 3), (3.0, 8), (3.0, 8), (4.0, 7)]
    df = spark.createDataFrame(rows, ["price", "size"])
    got = {
        (r["price"], r["size"]): r["n_dup"]
        for r in skyline_2d(df, "price", "size").collect()
    }
    assert got == {(1.0, 5): 2, (3.0, 8): 2}


def test_skyline_equal_price_keeps_only_best(spark):
    """At the same price, only the max size survives (strict dominance
    on the other dim)."""
    df = spark.createDataFrame([(1.0, 1), (1.0, 9)], ["price", "size"])
    got = [(r["price"], r["size"]) for r in skyline_2d(df, "price", "size").collect()]
    assert got == [(1.0, 9)]


def test_bfs_khop_min_distance_and_early_exit(spark):
    """Path a-b-c-d plus shortcut a-c: c must get dist 1 (via the
    shortcut, not 2 via b); e is unreachable and absent; rounds stop
    early once the frontier drains (k=10 on a diameter-2 reach)."""
    und = [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c")]
    edges = spark.createDataFrame(
        und + [(y, x) for x, y in und], ["src", "dst"]
    )
    seeds = spark.createDataFrame([("a",)], ["node"])
    got = {r["node"]: r["dist"] for r in bfs_khop(edges, seeds, k=10).collect()}
    assert got == {"a": 0, "b": 1, "c": 1, "d": 2}


def test_bfs_khop_respects_bound(spark):
    """k=1 must not reach two hops out."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")], ["src", "dst"]
    )
    seeds = spark.createDataFrame([("a",)], ["node"])
    got = {r["node"]: r["dist"] for r in bfs_khop(edges, seeds, k=1).collect()}
    assert got == {"a": 0, "b": 1}


def test_prefix_filter_equals_exact_join(spark):
    """Lossless candidates: prefix filtering must return exactly the
    pairs the full inverted-index join returns, on a corpus with
    near-dups, exact dups, and unrelated docs."""
    texts = [
        (1, "the quick brown fox jumps over the lazy dog tonight"),
        (2, "the quick brown fox jumps over the lazy dog today"),
        (3, "the quick brown fox jumps over the lazy dog tonight"),
        (4, "completely different words about spark and parquet files"),
        (5, "entirely other content mentioning ducks and databases here"),
    ]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    pf = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in prefix_filter_pairs(df, threshold=0.6, n=2).collect()
    }
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in jaccard_pairs(
            df, threshold=0.6, n=2, max_doc_freq=None
        ).collect()
    }
    assert pf == exact
    assert (1, 3) in pf and pf[(1, 3)] == 1.0


def test_prefix_filter_equals_exact_join_under_tripped_cap(spark):
    """The equality contract must survive the doc-frequency cap
    actually FIRING: with max_doc_freq=2 on a corpus where the shared
    boilerplate 2-grams appear in 4 docs, both paths must drop the hot
    shingles from every set (identical jaccard denominators) — the
    regression this pins is prefix_filter_pairs building UNCAPPED sets
    while jaccard_pairs and the suite oracle cap, which diverges on
    any corpus with a >cap shingle."""
    texts = [
        (1, "alpha beta gamma delta epsilon unique one"),
        (2, "alpha beta gamma delta epsilon unique two"),
        (3, "alpha beta gamma delta epsilon unique three"),
        (4, "alpha beta gamma delta epsilon unique four"),
        (5, "totally unrelated content about parquet row groups here"),
    ]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    kw = dict(threshold=0.3, n=2, max_doc_freq=2)
    pf = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in prefix_filter_pairs(df, **kw).collect()
    }
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in jaccard_pairs(df, **kw).collect()
    }
    assert pf == exact
    # sanity that the cap actually fired: uncapped disagrees
    uncapped = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in jaccard_pairs(
            df, threshold=0.3, n=2, max_doc_freq=None
        ).collect()
    }
    assert uncapped != exact


def test_pmi_hand_computed(spark):
    """4 docs; x and y co-occur in both of their docs (df=2 each,
    n_ab=2): PMI = ln(2·4/(2·2)) = ln 2.  Filler tokens are made
    unique per doc so the vocab cap keeps x/y."""
    rows = [
        (1, "x y a1 b1"),
        (2, "x y a2 b2"),
        (3, "p q a3 b3"),
        (4, "p r a4 b4"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["term_a"], r["term_b"]): (r["n_ab"], r["pmi"])
        for r in pmi_cooccur(df, vocab_size=30, top_k=50).collect()
    }
    n_ab, pmi = got[("x", "y")]
    assert n_ab == 2
    assert pmi == pytest.approx(round(math.log(2.0), 4))
    # p/q co-occur once with df(p)=2: PMI = ln(1·4/(2·1)) = ln 2 too
    assert got[("p", "q")][0] == 1


def test_pca_project_variances_match_eigenvalues(spark):
    """Projected component variances must equal the top eigenvalues of
    the corpus covariance, components must be uncorrelated, and PC1
    must carry the planted dominant direction."""
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.normal(0, 0.05, size=(400, 6))
    base[:, 2] += rng.normal(0, 1.0, size=400)  # plant a dominant axis
    rows = [(i, [float(x) for x in base[i]]) for i in range(400)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])

    from elastic_asset_etl_poc_spark.operators.similarity import pca_project

    proj = np.array(
        [r["proj"] for r in pca_project(df, k=3).orderBy("vec_id").collect()]
    )
    cov = np.cov(base.T, bias=True)
    vals = np.sort(np.linalg.eigvalsh(cov))[::-1][:3]
    got = proj.var(axis=0)
    assert np.allclose(got, vals, rtol=1e-6)
    # uncorrelated components
    c = np.cov(proj.T, bias=True)
    off = c - np.diag(np.diag(c))
    assert np.abs(off).max() < 1e-9
    # PC1 ~ the planted axis: projection correlates with dim 2
    r = np.corrcoef(proj[:, 0], base[:, 2])[0, 1]
    assert abs(r) > 0.95


def test_kcore_hand_computed(spark):
    """Triangle {a,b,c} plus a pendant chain c-d-e: the 2-core is
    exactly the triangle (d's degree drops to 1 once e is peeled —
    the CASCADE a one-shot degree filter misses: d starts at degree
    2)."""
    import pyspark.sql.functions as F

    from elastic_asset_etl_poc_spark.operators.graph import kcore_membership

    und = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e")]
    edges = spark.createDataFrame(
        und + [(y, x) for x, y in und], ["src", "dst"]
    )
    got = {
        r["node"]: r["core_degree"]
        for r in kcore_membership(edges, k=2).collect()
    }
    assert got == {"a": 2, "b": 2, "c": 2}


def test_kcore_raises_past_round_bound(spark):
    """A long chain peels one node per round from each end at k=2 —
    max_rounds=2 must RAISE (the unrolled-oracle self-audit), not
    silently return a non-fixpoint."""
    import pytest as _pytest

    from elastic_asset_etl_poc_spark.operators.graph import kcore_membership

    chain = [(str(i), str(i + 1)) for i in range(12)]
    edges = spark.createDataFrame(
        chain + [(y, x) for x, y in chain], ["src", "dst"]
    )
    with _pytest.raises(RuntimeError, match="no fixpoint"):
        kcore_membership(edges, k=2, max_rounds=2)


def test_kcore_shuffled_semi_join_fallback_equals_broadcast(spark):
    """The size-gated survivor filter: max_broadcast_nodes=0 forces the
    shuffled semi-join fallback on EVERY round; results must equal the
    broadcast path exactly, on both the doubled and canonical edge
    layouts — and the fallback plan must actually drop the broadcast
    (spot-checked via the final frame's round joins executing without
    error; plan equality is not the contract, row equality is)."""
    from elastic_asset_etl_poc_spark.operators.graph import kcore_membership

    und = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 3), (4, 6), (6, 7)]
    edges = spark.createDataFrame(
        [(a, b) for a, b in und] + [(b, a) for a, b in und], ["src", "dst"]
    )
    canon = spark.createDataFrame(und, ["src", "dst"])
    want = {
        r["node"]: r["core_degree"]
        for r in kcore_membership(edges, k=2).collect()
    }
    assert want  # the 1-2-3 and 3-4-5 triangles survive
    for kw in (
        dict(),
        dict(canonical=True),
    ):
        got = {
            r["node"]: r["core_degree"]
            for r in kcore_membership(
                canon if kw.get("canonical") else edges,
                k=2,
                max_broadcast_nodes=0,
                **kw,
            ).collect()
        }
        assert got == want, f"fallback diverged for {kw}"


def test_label_propagation_finds_planted_communities(spark):
    """Two dense cliques joined by a single bridge edge: 3 rounds of
    deterministic LPA must give each clique one label (the smallest
    member id — min tie-break propagates the minimum through dense
    groups) and must NOT merge them across the bridge."""
    from elastic_asset_etl_poc_spark.operators.graph import label_propagation

    def clique(ids):
        return [(a, b) for a in ids for b in ids if a != b]

    g1 = [f"a{i}" for i in range(6)]
    g2 = [f"b{i}" for i in range(6)]
    und = clique(g1) + clique(g2) + [("a0", "b0"), ("b0", "a0")]
    edges = spark.createDataFrame(und, ["src", "dst"]).repartition(3)
    got = {
        r.node: r.label
        for r in label_propagation(edges, rounds=3).collect()
    }
    assert {got[n] for n in g1} == {"a0"}
    assert {got[n] for n in g2} == {"b0"}


def test_label_propagation_deterministic_across_partitions(spark):
    """Sync update + min tie-break: the result is a pure function of
    the edge set, independent of partitioning."""
    from elastic_asset_etl_poc_spark.operators.graph import label_propagation

    und = [("x1", "x2"), ("x2", "x1"), ("x2", "x3"), ("x3", "x2"),
           ("x3", "x4"), ("x4", "x3")]
    runs = []
    for n in (1, 7):
        edges = spark.createDataFrame(und, ["src", "dst"]).repartition(n)
        runs.append(sorted(
            (r.node, r.label)
            for r in label_propagation(edges, rounds=3).collect()
        ))
    assert runs[0] == runs[1]


def test_label_propagation_audit_churn(spark):
    """audit_churn adds the final-round ``changed`` flag: on a clique
    that stabilizes in round 1, extra rounds report zero churn; on a
    path graph still refining at rounds=1, the flag captures exactly
    the nodes whose round-1 label differs from their initial label."""
    from elastic_asset_etl_poc_spark.operators.graph import label_propagation

    ids = [f"a{i}" for i in range(5)]
    und = [(a, b) for a in ids for b in ids if a != b]
    edges = spark.createDataFrame(und, ["src", "dst"])
    rows = label_propagation(edges, rounds=3, audit_churn=True).collect()
    assert all(r.label == "a0" for r in rows)
    assert not any(r.changed for r in rows)  # converged before round 3

    path = [("x1", "x2"), ("x2", "x1"), ("x2", "x3"), ("x3", "x2")]
    pe = spark.createDataFrame(path, ["src", "dst"])
    r1 = {
        r.node: r.changed
        for r in label_propagation(pe, rounds=1, audit_churn=True).collect()
    }
    # round 1: x2 and x3 adopt x1's/x2's smaller label; x1 keeps its own
    assert r1 == {"x1": False, "x2": True, "x3": True}


def test_containment_prefix_equals_exact_join(spark):
    """Containment prefix filter is lossless on the doc-inside-doc
    shape Jaccard misses: a short doc fully embedded in a long one
    must surface with containment 1.0 from BOTH paths, identically."""
    from elastic_asset_etl_poc_spark.operators.neardup import (
        containment_pairs,
        containment_prefix_pairs,
    )

    long = (
        "the quick brown fox jumps over the lazy dog while "
        "seventeen additional clauses pad this document with "
        "unrelated filler about parquet row groups and shuffles"
    )
    texts = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, long),
        (3, "entirely other content mentioning ducks and databases here"),
    ]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    kw = dict(threshold=0.5, n=2)
    pf = {
        (r["doc_a"], r["doc_b"]): (r["containment"], r["jaccard"])
        for r in containment_prefix_pairs(df, **kw).collect()
    }
    exact = {
        (r["doc_a"], r["doc_b"]): (r["containment"], r["jaccard"])
        for r in containment_pairs(df, **kw).collect()
    }
    assert pf == exact
    assert (1, 2) in pf
    assert pf[(1, 2)][0] == 1.0  # fully contained
    assert pf[(1, 2)][1] < 0.5  # the pair a Jaccard pass misses


def test_containment_prefix_equals_exact_join_under_tripped_cap(spark):
    """The bit-equality contract must survive the doc-frequency cap
    actually firing — both paths drop the hot shingles from every set
    so containment/jaccard denominators stay identical."""
    from elastic_asset_etl_poc_spark.operators.neardup import (
        containment_pairs,
        containment_prefix_pairs,
    )

    texts = [
        (1, "alpha beta gamma delta epsilon unique one"),
        (2, "alpha beta gamma delta epsilon unique two"),
        (3, "alpha beta gamma delta epsilon unique three"),
        (4, "alpha beta gamma delta epsilon unique four"),
        (5, "totally unrelated content about parquet row groups here"),
    ]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    kw = dict(threshold=0.3, n=2, max_doc_freq=2)
    pf = {
        (r["doc_a"], r["doc_b"]): (r["containment"], r["jaccard"])
        for r in containment_prefix_pairs(df, **kw).collect()
    }
    exact = {
        (r["doc_a"], r["doc_b"]): (r["containment"], r["jaccard"])
        for r in containment_pairs(df, **kw).collect()
    }
    assert pf == exact
    uncapped = {
        (r["doc_a"], r["doc_b"]): (r["containment"], r["jaccard"])
        for r in containment_pairs(
            df, threshold=0.3, n=2, max_doc_freq=None
        ).collect()
    }
    assert uncapped != exact


def test_kcore_stable_graph_converges_in_one_observed_round(spark):
    """r17 fixpoint fold: the node/below-k counts ride the degree
    checkpoint job as observe metrics, and zero-below-k exits WITHOUT
    the old extra confirmation round.  On an already-stable graph (a
    triangle at k=2) that is exactly TWO jobs — the edge checkpoint and
    the single degree checkpoint — where the old shape needed a count
    action per round plus one whole extra peel+recount round.  Pinned
    via the job-group job count (deterministic for a fixed code path),
    both layouts."""
    from elastic_asset_etl_poc_spark.operators.graph import kcore_membership

    und = [("a", "b"), ("b", "c"), ("a", "c")]
    edges = spark.createDataFrame(
        und + [(y, x) for x, y in und], ["src", "dst"]
    )
    canon = spark.createDataFrame(und, ["src", "dst"])
    sc = spark.sparkContext
    for layout, frame in (("doubled", edges), ("canonical", canon)):
        grp = f"kcore_stable_{layout}"
        sc.setJobGroup(grp, grp)
        got = {
            r[0]: r[1]
            for r in kcore_membership(
                frame, k=2, canonical=(layout == "canonical")
            ).collect()
        }
        sc.setJobGroup(None, None)
        assert got == {"a": 2, "b": 2, "c": 2}, layout
        n_jobs = len(sc.statusTracker().getJobIdsForGroup(grp))
        # 2 checkpoint jobs + the result collect = 3; the pre-r17 shape
        # was >= 7 (per-round count actions + the confirmation round)
        assert n_jobs <= 4, (layout, n_jobs)
