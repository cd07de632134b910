"""Benchmark-decontamination operator tests (literal frames)."""

from pyspark.sql import functions as F

from elastic_asset_etl_poc_spark.operators.decontam import decontaminate


def _frames(spark):
    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),  # contains eval 4-gram
            (2, "one two three four five six seven"),  # clean
            (3, "alpha beta gamma delta"),  # exactly one eval 4-gram
            (4, "beta gamma delta alpha"),  # same words, different order: clean
            (5, "tiny"),  # shorter than one 4-gram: clean
        ],
        "doc_id long, text string",
    )
    eval_df = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")],
        "doc_id long, text string",
    )
    return train, eval_df


def test_decontaminate_flags_ngram_overlap(spark):
    train, eval_df = _frames(spark)
    out = {r.doc_id: r for r in decontaminate(train, eval_df, n=4).collect()}
    assert len(out) == 5  # every train doc gets a verdict row
    # eval has two 4-grams: "alpha beta gamma delta", "beta gamma delta epsilon"
    assert out[1].n_hits == 2 and out[1].contaminated
    assert out[3].n_hits == 1 and out[3].contaminated
    for clean in (2, 4, 5):
        assert out[clean].n_hits == 0 and not out[clean].contaminated


def test_decontaminate_min_hits_threshold(spark):
    train, eval_df = _frames(spark)
    out = {r.doc_id: r.contaminated for r in decontaminate(train, eval_df, n=4, min_hits=2).collect()}
    assert out[1] and not out[3]  # doc 3 has only 1 hit


def test_decontaminate_eval_side_is_broadcast(spark):
    train, eval_df = _frames(spark)
    plan = decontaminate(train, eval_df, n=4)._jdf.queryExecution().executedPlan().toString()
    # the eval-shingle probe is the only Inner join and must be broadcast;
    # the one allowed shuffle join is the final LeftOuter back to train ids
    # (tiny hits side — AQE demotes it to broadcast at runtime)
    assert "BroadcastHashJoin" in plan and "Inner, BuildRight" in plan
    assert plan.count("SortMergeJoin") <= 1 and "SortMergeJoin" not in plan.split("LeftOuter")[-1]
