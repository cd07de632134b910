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


def test_mmr_rerank_matches_greedy_reference(spark):
    """mmr_rerank reproduces the sequential greedy exactly on a
    hand-built candidate set where relevance and diversity disagree:
    docs 1,2 are near-identical top hits, doc 3 is less relevant but
    novel — MMR must pick 1 then 3, demoting 2."""
    from elastic_asset_etl_poc_spark.operators.retrieval import mmr_rerank

    cand = spark.createDataFrame(
        [("q", 1, 0.9), ("q", 2, 0.88), ("q", 3, 0.5), ("q", 4, 0.45)],
        "query_id string, doc_id int, rel double",
    )
    sims = spark.createDataFrame(
        [(1, 2, 0.95), (1, 3, 0.05), (2, 3, 0.05), (3, 4, 0.9)],
        "doc_a int, doc_b int, sim double",
    )
    out = sorted(
        mmr_rerank(cand, sims, k=3, lam=0.7).collect(),
        key=lambda r: r.rank,
    )
    assert [r.doc_id for r in out] == [1, 3, 2]
    # scores replay the recurrence: pick1 = .7*.9; pick2 scores
    # 2:.7*.88-.3*.95, 3:.7*.5-.3*.05, 4:.7*.45-.3*0 -> 3 wins (.335)
    assert abs(out[0].mmr_score - 0.7 * 0.9) < 1e-12
    assert abs(out[1].mmr_score - (0.7 * 0.5 - 0.3 * 0.05)) < 1e-12
    # pick3: 2:.7*.88-.3*.95=.331, 4:.7*.45-.3*.9=.045 -> 2 wins
    assert abs(out[2].mmr_score - (0.7 * 0.88 - 0.3 * 0.95)) < 1e-12


def test_mmr_rerank_random_matches_python_greedy(spark):
    """Randomized parity: the DataFrame unroll equals a plain-Python
    greedy on seeded random candidates/sims across multiple queries."""
    import random

    from elastic_asset_etl_poc_spark.operators.retrieval import mmr_rerank

    rng = random.Random(7)
    qs = ["a", "b"]
    cand_rows = [
        (q, d, round(rng.random(), 6)) for q in qs for d in range(8)
    ]
    sim_rows = [
        (i, j, round(rng.random(), 6))
        for i in range(8)
        for j in range(i + 1, 8)
        if rng.random() < 0.6
    ]
    cand = spark.createDataFrame(
        cand_rows, "query_id string, doc_id int, rel double"
    )
    sims = spark.createDataFrame(sim_rows, "doc_a int, doc_b int, sim double")
    k, lam = 4, 0.7
    out = {
        (r.query_id, r.rank): (r.doc_id, r.mmr_score)
        for r in mmr_rerank(cand, sims, k=k, lam=lam).collect()
    }
    smap = {}
    for i, j, s in sim_rows:
        smap[(i, j)] = s
        smap[(j, i)] = s
    for q in qs:
        rels = {d: r for qq, d, r in cand_rows if qq == q}
        chosen = []
        for rank in range(1, k + 1):
            best = None
            for d, r in rels.items():
                if d in chosen:
                    continue
                ms = max(
                    (smap.get((d, c), 0.0) for c in chosen), default=0.0
                )
                score = lam * r - (1.0 - lam) * ms if chosen else lam * r
                key = (-score, d)
                if best is None or key < best[0]:
                    best = (key, d, score)
            chosen.append(best[1])
            assert out[(q, rank)][0] == best[1], (q, rank)
            assert abs(out[(q, rank)][1] - best[2]) < 1e-12
