"""BPE training/segmentation vs a pure-Python reference implementation."""

import re
from collections import Counter

import pytest

from elastic_asset_etl_poc_spark.operators.bpe import (
    bpe_segment,
    bpe_train,
    word_symbol_counts,
)


# --- pure-Python reference: greedy count-desc/pair-asc BPE (Sennrich) ---

def _ref_word_counts(texts):
    c = Counter()
    for t in texts:
        c.update(re.findall(r"[a-z0-9]+", t.lower()))
    return {tuple(w): n for w, n in c.items()}


def _ref_merge_word(word: tuple, pair: tuple) -> tuple:
    out, i = [], 0
    while i < len(word):
        if i + 1 < len(word) and (word[i], word[i + 1]) == pair:
            out.append(word[i] + word[i + 1])
            i += 2
        else:
            out.append(word[i])
            i += 1
    return tuple(out)


def _ref_train_full(word_counts: dict, n_merges: int):
    """Greedy BPE: per round, argmax pair by (count desc, pair asc)."""
    merges = []
    wc = dict(word_counts)
    for _ in range(n_merges):
        pc = Counter()
        for w, n in wc.items():
            for a, b in zip(w, w[1:]):
                pc[(a, b)] += n
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}"))
        merges.append(best[0])
        wc = {_ref_merge_word(w, best[0]): n for w, n in wc.items()}
    return merges


TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the theory of the thing: the more the merrier",
    "low lower lowest newer newest widest the end",
    "aaa aaaa aa the banana bandana",
]


@pytest.fixture(scope="module")
def trained(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], ["text"])
    mt = bpe_train(word_symbol_counts(df), 8)
    return df, mt, mt.orderBy("merge_rank").collect()


def test_bpe_train_matches_reference(trained):
    _, _, rows = trained
    got = [((r["lhs"], r["rhs"]), r["pair_count"]) for r in rows]
    ref_merges = _ref_train_full(_ref_word_counts(TEXTS), 8)
    # recompute reference pair counts alongside for the count column
    wc = _ref_word_counts(TEXTS)
    ref = []
    for pair in ref_merges:
        pc = Counter()
        for w, n in wc.items():
            for a, b in zip(w, w[1:]):
                pc[(a, b)] += n
        ref.append((pair, pc[pair]))
        wc = {_ref_merge_word(w, pair): n for w, n in wc.items()}
    assert got == ref
    assert [r["merged"] for r in rows] == [a + b for (a, b), _ in ref]


def test_bpe_overlapping_pair_greedy(spark):
    # "a a a a" must merge as (aa)(aa), and "a a a" as (aa) a — greedy
    # left-to-right non-overlapping, the reference BPE scan order
    df = spark.createDataFrame([("aaaa aaa",)], ["text"])
    mt = bpe_train(word_symbol_counts(df), 1)
    seg = bpe_segment(df, mt).collect()[0]
    assert [r["merged"] for r in mt.collect()] == ["aa"]
    assert seg["bpe_tokens"] == 2 + 2  # aa|aa + aa|a
    assert seg["bpe_tokens_sample"] == "aa|aa"


def test_bpe_segment_counts(spark, trained):
    df, mt, rows = trained
    seg = {
        r["text"]: (r["bpe_tokens"], r["bpe_tokens_sample"])
        for r in bpe_segment(df, mt).collect()
    }
    # reference segmentation: apply merges in rank order per word
    merges = [(r["lhs"], r["rhs"]) for r in rows]
    for t in TEXTS:
        words = [tuple(w) for w in re.findall(r"[a-z0-9]+", t.lower())]
        for pair in merges:
            words = [_ref_merge_word(w, pair) for w in words]
        n = sum(len(w) for w in words)
        assert seg[t][0] == n, t
        assert seg[t][1] == "|".join(words[0]), t


def test_bpe_merges_never_cross_words(spark):
    # "ab" only ever adjacent ACROSS words: pair (b, a) between words
    # must not be counted or merged
    df = spark.createDataFrame([("ab ab ab ab",)], ["text"])
    mt = bpe_train(word_symbol_counts(df), 1)
    rows = mt.collect()
    assert [(r["lhs"], r["rhs"]) for r in rows] == [("a", "b")]
    seg = bpe_segment(df, mt).collect()[0]
    assert seg["bpe_tokens"] == 4


def test_bpe_train_exhausts_gracefully(spark):
    # single repeated 2-char word: only 1 possible merge, ask for 5
    df = spark.createDataFrame([("ab ab",)], ["text"])
    mt = bpe_train(word_symbol_counts(df), 5)
    assert mt.count() == 1


def test_bpe_empty_corpus(spark):
    df = spark.createDataFrame([("",), ("!!!",)], ["text"])
    mt = bpe_train(word_symbol_counts(df), 3)
    assert mt.count() == 0
    seg = bpe_segment(df, mt).collect()
    assert all(r["bpe_tokens"] == 0 for r in seg)


def test_frozen_vocab_matches_live_training_sf001(spark):
    """suite._BPE_FROZEN_MERGES freezes the sf0.01 training output so the
    driver oracle replays segmentation only.  Certify the handshake by
    re-training LIVE on the sf0.01 fixture and asserting the frozen
    literals are byte-identical — a fixture or trainer change that would
    silently drift the frozen vocab fails here, not in the driver."""
    from elastic_asset_etl_poc_spark.suite import _BPE_FROZEN_MERGES, _BPE_N

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    mt = bpe_train(word_symbol_counts(docs), _BPE_N)
    live = [
        (r["merge_rank"], r["lhs"], r["rhs"], r["merged"], r["pair_count"])
        for r in mt.orderBy("merge_rank").collect()
    ]
    assert live == _BPE_FROZEN_MERGES
