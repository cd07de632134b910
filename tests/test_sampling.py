"""Deterministic sampling/splitting operator tests."""

import pytest
from conftest import SF_DIR

from elastic_asset_etl_poc_spark.operators.sampling import (
    deterministic_split,
    hash_sample,
    stratified_hash_sample,
)
from elastic_asset_etl_poc_spark.sources.registry import load_table


def test_split_covers_all_rows_and_is_stable(spark):
    docs = load_table(spark, SF_DIR, "documents")
    out = deterministic_split(docs).select("doc_id", "split")
    n = docs.count()
    assert out.count() == n
    again = {r.doc_id: r.split for r in deterministic_split(docs).collect()}
    for r in out.collect():
        assert again[r.doc_id] == r.split  # pure function of (id, salt)
    counts = {r.split: r[1] for r in out.groupBy("split").count().collect()}
    assert counts.get("train", 0) > counts.get("val", 0)
    assert set(counts) <= {"train", "val", "test"}


def test_split_stable_under_corpus_growth(spark):
    """Rows keep their split when new data arrives (contamination
    control): the assignment on a subset equals the assignment on the
    full corpus."""
    docs = load_table(spark, SF_DIR, "documents")
    full = {r.doc_id: r.split for r in deterministic_split(docs).collect()}
    sub = {
        r.doc_id: r.split
        for r in deterministic_split(docs.filter("doc_id % 2 = 0")).collect()
    }
    assert sub == {k: v for k, v in full.items() if k % 2 == 0}


def test_hash_sample_nested_and_sized(spark):
    docs = load_table(spark, SF_DIR, "documents")
    n = docs.count()
    s10 = {r.doc_id for r in hash_sample(docs, 0.10).select("doc_id").collect()}
    s05 = {r.doc_id for r in hash_sample(docs, 0.05).select("doc_id").collect()}
    assert s05 <= s10  # nested: smaller fraction is a subset
    assert abs(len(s10) / n - 0.10) < 0.08  # expected proportion, small corpus
    with pytest.raises(ValueError):
        hash_sample(docs, 1.5)


def test_stratified_sample_keep_list(spark):
    ev = load_table(spark, SF_DIR, "events")
    out = stratified_hash_sample(
        ev, "event_type", {"purchase": 1.0}, id_col="event_id"
    )
    kept = {r.event_type for r in out.select("event_type").distinct().collect()}
    assert kept == {"purchase"}  # unlisted strata dropped
    n_purch = ev.filter("event_type = 'purchase'").count()
    assert out.count() == n_purch  # fraction 1.0 is the exact identity


def test_hash_sample_full_fraction_identity(spark):
    docs = load_table(spark, SF_DIR, "documents")
    assert hash_sample(docs, 1.0).count() == docs.count()


def test_split_and_sample_agree_on_null_ids(spark):
    """NULL ids hash as '' in BOTH operators: they get a deterministic
    split label and appear in samples — never silently inconsistent."""
    df = spark.createDataFrame([(None,), (1,), (2,)], "doc_id long")
    splits = {r.doc_id: r.split for r in deterministic_split(df).collect()}
    assert splits[None] in ("train", "val", "test")
    full = hash_sample(df, 1.0)
    assert full.count() == 3  # NULL-id row not dropped


def test_temperature_fractions_limits(spark):
    from elastic_asset_etl_poc_spark.operators.sampling import temperature_fractions

    counts = {"en": 1_000_000, "fr": 10_000, "sw": 100}
    # T=1: natural mixture -> keep everything
    assert temperature_fractions(counts, 1.0) == {"en": 1.0, "fr": 1.0, "sw": 1.0}
    # T -> inf: expected kept counts equalize (n_i * keep_i equal)
    f = temperature_fractions(counts, 1e9)
    kept = {k: counts[k] * v for k, v in f.items()}
    assert abs(kept["en"] - kept["sw"]) / kept["sw"] < 0.01
    # intermediate T: rare strata keep more than common ones
    f2 = temperature_fractions(counts, 2.0)
    assert f2["sw"] == 1.0 and f2["sw"] > f2["fr"] > f2["en"]
    import pytest

    with pytest.raises(ValueError):
        temperature_fractions(counts, 0)


def test_temperature_mix_end_to_end(spark):
    """counts -> temperature fractions -> stratified sample composes."""
    from elastic_asset_etl_poc_spark.operators.sampling import temperature_fractions

    ev = load_table(spark, SF_DIR, "events")
    counts = {r.event_type: r[1] for r in ev.groupBy("event_type").count().collect()}
    f = temperature_fractions(counts, temperature=3.0)
    out = stratified_hash_sample(ev, "event_type", f, id_col="event_id")
    got = {r.event_type: r[1] for r in out.groupBy("event_type").count().collect()}
    assert set(got) == set(counts)
    for k in counts:  # every stratum survives, none grows
        assert 0 < got[k] <= counts[k]


def test_temperature_fractions_empty_strata(spark):
    from elastic_asset_etl_poc_spark.operators.sampling import temperature_fractions

    assert temperature_fractions({}, 2.0) == {}
    assert temperature_fractions({"en": 0}, 2.0) == {}


def test_pack_sequences_invariants(spark):
    """Packing invariants per shard: offsets are contiguous in doc order,
    sequence spans match token counts, and a doc spanning a cut has
    last_seq > first_seq."""
    from elastic_asset_etl_poc_spark.operators.sampling import pack_sequences

    df = spark.createDataFrame(
        [
            (0, " ".join(["w"] * 300)),
            (2, " ".join(["w"] * 300)),  # same shard (n_shards=2): spans the 512 cut
            (4, " ".join(["w"] * 100)),
            (1, " ".join(["w"] * 50)),  # other shard
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in pack_sequences(df, max_tokens=512, n_shards=2).collect()}
    assert rows[0].start_offset == 0 and rows[0].n_tokens == 300
    assert rows[2].start_offset == 300  # contiguous within shard 0
    assert rows[4].start_offset == 600
    # doc 2 occupies offsets [300, 600) -> crosses the 512 boundary
    assert rows[2].first_seq == 0 and rows[2].last_seq == 1
    assert rows[4].first_seq == 1 and rows[4].last_seq == 1
    # shard 1 ids live in a disjoint sequence-id space
    assert rows[1].first_seq == 1_000_000_000
    # total tokens = sum of per-doc counts (nothing lost or padded)
    assert sum(r.n_tokens for r in rows.values()) == 750


def test_weighted_sample_proportional_and_stable(spark):
    """Keep rate tracks the weight; membership is a pure function of id
    (stable under repartition); NULL weights drop."""
    from pyspark.sql import functions as F
    from elastic_asset_etl_poc_spark.operators.sampling import weighted_sample

    n = 4000
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, F.lit(1.0)).otherwise(F.lit(4.0)).alias("w"),
    )
    out = weighted_sample(df, rate=0.1, weight_col="w")
    rows = out.collect()
    light = sum(1 for r in rows if r.w == 1.0) / (n / 2)
    heavy = sum(1 for r in rows if r.w == 4.0) / (n / 2)
    assert abs(light - 0.1) < 0.03
    assert abs(heavy - 0.4) < 0.05
    again = weighted_sample(df.repartition(13), rate=0.1, weight_col="w")
    assert sorted(r.doc_id for r in rows) == sorted(
        r.doc_id for r in again.collect()
    )
    # p >= 1 keeps (essentially) everything; NULL weight drops
    full = weighted_sample(df, rate=1.0, weight_col="w").count()
    assert full == n
    nul = df.withColumn("w", F.lit(None).cast("double"))
    assert weighted_sample(nul, rate=0.5, weight_col="w").count() == 0


def test_weighted_sample_negative_weight_and_custom_id(spark):
    """Negative weights clamp to probability 0 (the 16-char hex of a
    negative threshold must not truncate to keep-everything), and
    pack_sequences works with a non-default id column."""
    from pyspark.sql import functions as F
    from elastic_asset_etl_poc_spark.operators.sampling import (
        pack_sequences,
        weighted_sample,
    )

    df = spark.range(500).select(
        F.col("id").alias("doc_id"), F.lit(-2.0).alias("w")
    )
    assert weighted_sample(df, rate=0.1, weight_col="w").count() == 0

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "d e f")], "media_id long, text string"
    )
    out = pack_sequences(docs, max_tokens=4, id_col="media_id").collect()
    assert sorted(r.doc_id for r in out) == [1, 2]


def test_cap_per_key_bounds_and_stability(spark):
    import pytest

    from elastic_asset_etl_poc_spark.operators.sampling import cap_per_key

    df = spark.createDataFrame(
        [(i, "hot" if i < 20 else "cold") for i in range(24)],
        "doc_id long, source string",
    )
    capped = cap_per_key(df, "source", 3)
    by_key = {}
    for r in capped.collect():
        by_key.setdefault(r.source, set()).add(r.doc_id)
    assert len(by_key["hot"]) == 3
    assert len(by_key["cold"]) == 3
    # survivor NESTING: the cap-2 survivors are a strict subset of cap-3's
    two = {r.doc_id for r in cap_per_key(df, "source", 2).collect()}
    three = {r.doc_id for r in capped.collect()}
    assert two < three and len(two) == 4
    assert all(
        len({d for d in two if (d < 20) == hot}) == 2 for hot in (True, False)
    )
    # determinism + independence: adding rows to ANOTHER key leaves this
    # key's survivors unchanged
    grown = df.union(
        spark.createDataFrame([(100, "new"), (101, "new")], df.schema)
    )
    hot_after = {
        r.doc_id for r in cap_per_key(grown, "source", 3).collect() if r.doc_id < 20
    }
    assert hot_after == by_key["hot"]
    with pytest.raises(ValueError):
        cap_per_key(df, "source", 0)


def test_select_under_token_budget_invariants(spark):
    """Admitted set is a best-first prefix of score buckets: total tokens
    within budget, and the next-best excluded bucket would not fit."""
    import random

    from pyspark.sql import functions as F
    from elastic_asset_etl_poc_spark.operators.sampling import (
        select_under_token_budget,
    )

    rng = random.Random(0xB46E7)
    rows = [
        (i, rng.randrange(1, 400), rng.randrange(0, 25))
        for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens int, score_bucket long")
    budget = 60_000
    out = select_under_token_budget(df, budget)
    got = out.collect()
    total = sum(r.n_tokens for r in got)
    assert 0 < total <= budget
    admitted = {r.score_bucket for r in got}
    all_buckets = {r[2] for r in rows}
    # prefix property: every bucket above the worst admitted one is in
    assert all(b in admitted for b in all_buckets if b > min(admitted))
    # maximality: the best excluded bucket would blow the budget
    excluded = all_buckets - admitted
    if excluded:
        nxt = max(excluded)
        nxt_tokens = sum(r[1] for r in rows if r[2] == nxt)
        assert total + nxt_tokens > budget


def test_mixture_resample_proportions_and_binding_stratum(spark):
    """Target-mixture resampling: the binding stratum (largest n/t ratio
    deficit) is kept wholly, other strata are thinned to match, the
    realized mixture approximates the targets, membership is
    deterministic, and unlisted strata drop."""
    from pyspark.sql import functions as F

    from elastic_asset_etl_poc_spark.operators.sampling import mixture_resample

    rows = (
        [(i, "a") for i in range(4000)]
        + [(i + 10_000, "b") for i in range(1000)]
        + [(i + 20_000, "c") for i in range(1000)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string")
    # targets: b is binding (n_b/t_b = 1000/0.4 = 2500 = B):
    # keep_a = 2500*0.4/4000 = 0.25, keep_b = 1.0, keep_c = 2500*0.2/1000 = 0.5
    out = mixture_resample(df, {"a": 0.4, "b": 0.4, "c": 0.2})
    counts = {r["source"]: r["n"] for r in
              out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts["b"] == 1000  # binding stratum fully kept
    assert abs(counts["a"] - 1000) < 120  # ~0.25 of 4000, hash-approximate
    assert abs(counts["c"] - 500) < 90
    assert set(counts) == {"a", "b", "c"}

    # deterministic: identical second run
    again = {r["source"]: r["n"] for r in
             mixture_resample(df, {"a": 0.4, "b": 0.4, "c": 0.2})
             .groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert again == counts

    # unlisted stratum drops; bad targets raise
    only_ab = mixture_resample(df, {"a": 0.5, "b": 0.5})
    assert only_ab.filter("source = 'c'").count() == 0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        mixture_resample(df, {})
    with _pytest.raises(ValueError):
        mixture_resample(df, {"a": 0.0})


def test_cluster_split_members_inherit_representative(spark):
    from elastic_asset_etl_poc_spark.operators.sampling import (
        cluster_split,
        deterministic_split,
    )

    docs = spark.createDataFrame(
        [(i,) for i in range(1, 11)], "doc_id long"
    )
    # two clusters: {1,2,3} (chain) and {7,8}; rest singletons
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "doc_a long, doc_b long"
    )
    out = {r.doc_id: r for r in cluster_split(docs, pairs).collect()}
    assert len(out) == 10
    assert {out[i].cluster for i in (1, 2, 3)} == {1}
    assert {out[i].cluster for i in (7, 8)} == {7}
    # every member carries its representative's draw, not its own
    assert len({out[i].split for i in (1, 2, 3)}) == 1
    assert len({out[i].split for i in (7, 8)}) == 1
    rep_draw = {
        r.cluster: r.split
        for r in deterministic_split(
            spark.createDataFrame([(1,), (7,)], "cluster long"), id_col="cluster"
        ).collect()
    }
    assert out[3].split == rep_draw[1] and out[8].split == rep_draw[7]


def test_epoch_shuffle_is_deterministic_permutation(spark):
    from elastic_asset_etl_poc_spark.operators.sampling import epoch_shuffle

    df = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
    a = epoch_shuffle(df, n_shards=4, epoch=0).collect()
    b = epoch_shuffle(df, n_shards=4, epoch=0).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # replayable
    # every row exactly once; positions contiguous from 1 per shard
    assert sorted(r.doc_id for r in a) == list(range(100))
    by_shard = {}
    for r in a:
        by_shard.setdefault(r.shard, []).append(r.pos)
    assert set(by_shard) <= set(range(4))
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # a different epoch is a different permutation
    c = epoch_shuffle(df, n_shards=4, epoch=1).collect()
    assert sorted(map(tuple, c)) != sorted(map(tuple, a))


def test_negative_samples_invariants(spark):
    """Every doc draws exactly k distinct partners (corpus ≫ k), never
    itself; the pairing is deterministic and stable under
    repartitioning."""
    from elastic_asset_etl_poc_spark.operators.sampling import negative_samples

    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    out = negative_samples(df, k=3, shards=8).collect()
    by_doc = {}
    for r in out:
        assert r["doc_id"] != r["neg_id"]
        by_doc.setdefault(r["doc_id"], []).append((r["j"], r["neg_id"]))
    assert set(by_doc) == set(range(200))
    for doc, partners in by_doc.items():
        assert sorted(j for j, _ in partners) == [1, 2, 3]
        assert len({n for _, n in partners}) == 3, doc
    again = {
        (r["doc_id"], r["j"], r["neg_id"])
        for r in negative_samples(df.repartition(13), k=3, shards=8).collect()
    }
    assert again == {(r["doc_id"], r["j"], r["neg_id"]) for r in out}


def test_negative_samples_tiny_shard_distinct_partners(spark):
    """A shard smaller than k+1 caps offsets at n-1: each doc gets
    min(k, n-1) DISTINCT partners — no duplicate (id, neg_id) pairs
    under different j, no self-pairs, and a singleton corpus yields
    zero pairs rather than degenerate ones."""
    from elastic_asset_etl_poc_spark.operators.sampling import negative_samples

    df = spark.createDataFrame([(1,), (2,)], "doc_id long")
    out = negative_samples(df, k=3, shards=1).collect()
    assert all(r["doc_id"] != r["neg_id"] for r in out)
    # n=2: only offset 1 is valid; offsets 2 (self) and 3 (dup of 1) capped
    got = {(r["doc_id"], r["j"], r["neg_id"]) for r in out}
    assert got == {(1, 1, 2), (2, 1, 1)}

    solo = negative_samples(
        spark.createDataFrame([(9,)], "doc_id long"), k=3, shards=1
    ).collect()
    assert solo == []


def test_negative_samples_many_shards_all_docs_covered(spark):
    """shards > 256 must still populate every shard (16-bit draw):
    every doc keeps k partners when shards ≪ corpus, and no doc
    vanishes with a shard count a 1-byte draw couldn't reach."""
    from elastic_asset_etl_poc_spark.operators.sampling import negative_samples

    df = spark.createDataFrame([(i,) for i in range(3000)], "doc_id long")
    out = negative_samples(df, k=2, shards=500).collect()
    by_doc = {}
    for r in out:
        assert r["doc_id"] != r["neg_id"]
        by_doc.setdefault(r["doc_id"], set()).add(r["neg_id"])
    # ~6 docs/shard: only docs in (deterministic, rare) singleton shards
    # lack partners — with a 1-byte draw shards would hold ~12 docs in
    # half the id space and this bound plus the spread check both break
    assert len(by_doc) >= 2990
    assert all(len(p) == 2 for d, p in by_doc.items() if len(p) != 1)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        negative_samples(df, k=2, shards=70000)


def test_stratified_weighted_topk_exact_k_per_stratum(spark):
    from elastic_asset_etl_poc_spark.operators.sampling import (
        stratified_weighted_topk,
    )

    df = spark.createDataFrame(
        [(f"d{i:02d}", "s" + str(i % 3), float(1 + i % 5)) for i in range(30)],
        "doc_id string, src string, w double",
    )
    out = stratified_weighted_topk(
        df, k=2, weight_col="w", strata_cols="src"
    ).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.src, []).append(r.sample_rank)
    assert {s: sorted(v) for s, v in by_src.items()} == {
        "s0": [1, 2], "s1": [1, 2], "s2": [1, 2]
    }


def test_stratified_weighted_topk_small_stratum_and_weights(spark):
    from elastic_asset_etl_poc_spark.operators.sampling import (
        stratified_weighted_topk,
    )

    df = spark.createDataFrame(
        [("a", "s0", 1.0), ("b", "s0", None), ("c", "s0", 0.0),
         ("d", "s1", 2.0), ("e", "s1", 3.0), ("f", "s1", 4.0)],
        "doc_id string, src string, w double",
    )
    out = stratified_weighted_topk(df, k=5, weight_col="w", strata_cols="src")
    got = {(r.doc_id, r.src) for r in out.collect()}
    # s0: only 'a' has a positive weight; s1: all three (k=5 > |stratum|)
    assert got == {("a", "s0"), ("d", "s1"), ("e", "s1"), ("f", "s1")}


def test_stratified_weighted_topk_deterministic_and_matches_global(spark):
    """Per-stratum ranking over ONE stratum must equal weighted_topk's
    global ranking — same A-ES keys, same tiebreaks."""
    from elastic_asset_etl_poc_spark.operators.sampling import (
        stratified_weighted_topk,
        weighted_topk,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(f"d{i:02d}", float(1 + i % 7)) for i in range(40)],
        "doc_id string, w double",
    ).withColumn("src", F.lit("only"))
    a = sorted(
        (r.doc_id, r.sample_rank)
        for r in stratified_weighted_topk(
            df, k=10, weight_col="w", strata_cols="src", salt="wtopk"
        ).collect()
    )
    b = sorted(
        (r.doc_id, r.sample_rank)
        for r in weighted_topk(
            df.select("doc_id", "w"), k=10, weight_col="w", salt="wtopk"
        ).collect()
    )
    assert a == b


def test_privacy_gates_edges(spark):
    """k-anonymity / l-diversity / PSI edge semantics on constructed
    frames: uniform classes suppress nothing, a single-value sensitive
    class has exactly zero entropy, and identical windows yield exactly
    zero PSI terms."""
    import __spark_entry__ as e  # noqa: F401  (suite import side effects)
    from pyspark.sql import functions as F

    from elastic_asset_etl_poc_spark.suite import _psi_tail

    # PSI: identical reference/current counts -> every term exactly 0
    g = spark.createDataFrame(
        [("a", 10, 10), ("b", 30, 30), ("c", 60, 60)],
        "event_type string, nr long, nc long",
    )
    terms = [r.psi_term for r in _psi_tail(g).collect()]
    assert terms == [0.0, 0.0, 0.0]

    # entropy l-diversity: one sensitive value -> entropy exactly 0
    # after rounding (ln T - (T ln T)/T is ~1e-16 residue at worst)
    sv = spark.createDataFrame(
        [(1, "X", 7)], "qi int, sens string, c long"
    )
    total = F.sum("c")
    ent = sv.groupBy("qi").agg(
        F.round(
            F.log(total) - F.sum(F.col("c") * F.log("c")) / total, 6
        ).alias("entropy")
    )
    assert ent.collect()[0].entropy == 0.0
