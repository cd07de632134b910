"""Benchmark decontamination: remove training documents that overlap an
evaluation/benchmark set by exact word n-grams.

The standard contamination check (GPT-3 App. C / PaLM / Llama style): a
training document is contaminated when it shares at least ``min_hits``
distinct word n-grams with any document in the held-out evaluation set.

Scale posture (100 TB train corpus, MB-scale benchmark):
  * The eval side is tiny by construction — benchmarks are thousands of
    documents, not billions.  Its distinct-shingle set is aggregated once
    and **broadcast**, so the train side never shuffles for the probe:
    shingle-explode → broadcast hash join → per-doc count-agg (map-side
    partial combine).  The only full-width exchange is the per-doc hit
    aggregation on ``doc_id`` — unavoidable and linear.
  * Train shingles are NOT materialized distinct-globally (that would be
    a corpus-wide shuffle); distinctness is per-document, established
    inside the explode pipeline.
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
    """Flag training docs sharing ≥ ``min_hits`` distinct word ``n``-grams
    with the evaluation set.

    Returns one row per TRAIN document: (doc_id, n_hits, contaminated)
    where ``n_hits`` counts the distinct train-doc shingles found in the
    eval shingle set.  Callers drop ``contaminated`` rows (or audit them).
    """
    ev_sh = (
        shingles(eval_df, n=n, text_col=text_col, id_col=id_col)
        .select("shingle")
        .distinct()
    )
    tr_sh = shingles(train, n=n, text_col=text_col, id_col=id_col)
    hits = (
        tr_sh.join(F.broadcast(ev_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    ids = train.select(F.col(id_col).alias("doc_id"))
    return ids.join(hits, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
        (F.coalesce(F.col("n_hits"), F.lit(0)) >= min_hits).alias("contaminated"),
    )
