"""Benchmark decontamination: DROP training documents that overlap an
evaluation/benchmark set by exact word n-grams.

This is the *action* step of pre-training eval hygiene (GPT-3 App. C /
PaLM / Llama style): remove from the corpus every document sharing at
least ``min_hits`` distinct word n-grams with the benchmark.  Its
*audit* twin is :func:`..operators.neardup.contamination_check`, which
reports per-doc contamination fractions without filtering; use the
audit to pick ``n``/``min_hits``, then this to produce the clean corpus.

Scale posture (100 TB train corpus, MB-scale benchmark):
  * The eval side is tiny by construction — benchmarks are thousands of
    documents, not billions.  Its distinct-shingle set is aggregated once
    and **broadcast**, so the train side never shuffles on shingle: the
    probe is shingle-explode → broadcast hash join → per-doc hit agg
    (map-side partial combine).
  * The contaminated-id set that feeds the final anti-join is a small
    fraction of any sane corpus; it is left to AQE to demote that join
    to broadcast at runtime (a hygiene run that flags half the corpus
    should hurt — that is a data problem, not a plan problem).
  * No Python UDFs — shingling is the shared JVM ``transform`` kernel
    from :mod:`.neardup`.

Reference parity: the reference engine (jasonrhodes/elastic-asset-etl-poc)
has no decontamination; this extends the training-data-pipeline surface
per the build charter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .neardup import shingles


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 5,
    min_hits: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Return ``train`` minus documents sharing ≥ ``min_hits`` distinct
    word ``n``-grams with the evaluation set (all columns preserved).

    Documents shorter than one n-gram cannot be contaminated and are
    always retained.
    """
    ev_sh = (
        shingles(eval_df, n=n, text_col=text_col, id_col=id_col)
        .select("shingle")
        .distinct()
    )
    tr_sh = shingles(train, n=n, text_col=text_col, id_col=id_col)
    bad = (
        tr_sh.join(F.broadcast(ev_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("__n_hits"))
        .filter(F.col("__n_hits") >= min_hits)
        .select(F.col("doc_id").alias(id_col))
    )
    return train.join(bad, id_col, "left_anti")
