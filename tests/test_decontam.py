"""Benchmark-decontamination operator tests (literal frames)."""

from elastic_asset_etl_poc_spark.operators.decontam import decontaminate


def _frames(spark):
    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta", "en"),  # 2 eval 4-grams
            (2, "one two three four five six seven", "en"),  # clean
            (3, "alpha beta gamma delta", "de"),  # exactly one eval 4-gram
            (4, "beta gamma delta alpha", "de"),  # same words, other order: clean
            (5, "tiny", "fr"),  # shorter than one 4-gram: always retained
        ],
        "doc_id long, text string, lang string",
    )
    eval_df = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")],
        "doc_id long, text string",
    )
    return train, eval_df


def test_decontaminate_drops_overlapping_docs(spark):
    train, eval_df = _frames(spark)
    out = decontaminate(train, eval_df, n=4).collect()
    assert sorted(r.doc_id for r in out) == [2, 4, 5]
    # all original columns survive the filter
    assert {r.doc_id: r.lang for r in out} == {2: "en", 4: "de", 5: "fr"}


def test_decontaminate_min_hits_threshold(spark):
    train, eval_df = _frames(spark)
    # doc 1 has 2 eval 4-grams, doc 3 only 1 -> min_hits=2 keeps doc 3
    out = sorted(r.doc_id for r in decontaminate(train, eval_df, n=4, min_hits=2).collect())
    assert out == [2, 3, 4, 5]


def test_decontaminate_eval_side_is_broadcast(spark):
    train, eval_df = _frames(spark)
    plan = decontaminate(train, eval_df, n=4)._jdf.queryExecution().executedPlan().toString()
    # the eval-shingle probe is the only Inner join and must be broadcast;
    # the final anti-join on contaminated ids is AQE's call at runtime
    assert "BroadcastHashJoin" in plan and "Inner, BuildRight" in plan
