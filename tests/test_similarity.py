"""Similarity-search operator tests."""

from conftest import SF_DIR

from elastic_asset_etl_poc_spark.operators.similarity import cosine_topk, lsh_topk
from elastic_asset_etl_poc_spark.sources.registry import load_table


def vec_df(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.99, 0.1, 0.0]),  # nearest to 0
        (2, [0.0, 1.0, 0.0]),
        (3, [-1.0, 0.0, 0.0]),  # anti-parallel: last
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_topk_ordering(spark):
    emb = vec_df(spark)
    out = cosine_topk(emb, emb.filter("vec_id = 0"), k=3).collect()
    ranked = [r.neighbor_id for r in sorted(out, key=lambda r: r.rank)]
    assert ranked == [1, 2, 3]
    assert all(r.query_id == 0 for r in out)  # self excluded


def test_cosine_topk_k_bound(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    out = cosine_topk(emb, emb.filter("vec_id < 3"), k=5)
    rows = out.collect()
    assert len(rows) == 15
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r.rank)
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per_q.values())


def test_lsh_subset_of_bruteforce_universe(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    q = emb.filter("vec_id < 3")
    lsh = lsh_topk(emb, q, k=5).collect()
    assert len(lsh) <= 15  # approximate: may return fewer
    ids = {r.vec_id for r in emb.select("vec_id").collect()}
    for r in lsh:
        assert r.neighbor_id in ids and r.neighbor_id != r.query_id
