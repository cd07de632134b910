"""BM25 retrieval operator tests (literal frames, pure-Python expected)."""

import math

from elastic_asset_etl_poc_spark.operators.retrieval import bm25_topk


DOCS = [
    (1, "spark join join join filler filler filler filler"),
    (2, "spark join"),
    (3, "spark filler filler"),
    (4, "nothing relevant here at all"),
]


def _expected(queries, k1=1.2, b=0.75):
    toks = {d: t.split() for d, t in DOCS}
    n = len(DOCS)
    avgdl = sum(len(t) for t in toks.values()) / n
    out = {}
    for qid, qtext in queries:
        scores = {}
        for term in dict.fromkeys(qtext.split()):
            df = sum(1 for t in toks.values() if term in t)
            if df == 0:
                continue
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            for d, t in toks.items():
                tf = t.count(term)
                if tf:
                    dl = len(t)
                    scores[d] = scores.get(d, 0.0) + idf * tf * (k1 + 1) / (
                        tf + k1 * (1 - b + b * dl / avgdl)
                    )
        out[qid] = {d: round(s, 4) for d, s in scores.items()}
    return out


def test_bm25_matches_reference_formula(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    queries = [(1, "spark join"), (2, "filler")]
    got = bm25_topk(df, queries, k=10).collect()
    exp = _expected(queries)
    assert {(r.query_id, r.doc_id): r.score for r in got} == {
        (q, d): s for q, m in exp.items() for d, s in m.items()
    }
    # rank 1 for query 1 is the short doc with both terms (length norm wins)
    ranks = {(r.query_id, r.rank): r.doc_id for r in got}
    assert ranks[(1, 1)] == 2
    # non-matching doc 4 never appears
    assert all(r.doc_id != 4 for r in got)


def test_bm25_top_k_cuts_and_tiebreaks(spark):
    # five identical docs -> identical scores; tiebreak must be doc_id asc
    df = spark.createDataFrame(
        [(i, "spark join") for i in (5, 3, 1, 4, 2)], "doc_id long, text string"
    )
    got = bm25_topk(df, [(1, "spark")], k=3).collect()
    assert [(r.rank, r.doc_id) for r in sorted(got, key=lambda r: r.rank)] == [
        (1, 1), (2, 2), (3, 3)
    ]
