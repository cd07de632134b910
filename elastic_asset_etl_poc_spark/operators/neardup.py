"""Deduplication operators for training-data pipelines.

Exact dedup, n-gram Jaccard similarity join, MinHash+LSH near-dup, and
SimHash fingerprints — the standard large-corpus dedup ladder.  All are
pure DataFrame plans (no Python UDFs): hashing uses Spark's builtin
``xxhash64``/``md5``; set algebra is explode → hash-join → hash-agg, which
scales linearly and spills.

Scale posture (100 TB):
  * Exact dedup: one hash-agg on a 128-bit digest — never ``distinct`` on
    raw multi-KB text (shuffle writes the digest, not the document).
  * Jaccard join: inverted-index self-join on shingles.  The classic
    hazard is hot shingles (stop-phrases) exploding the join; cap document
    frequency with ``max_doc_freq`` — standard practice and a no-op on
    pair recall for high thresholds when the cap ≫ corpus dup group size.
  * MinHash+LSH: replaces the all-pairs shingle join with band-bucket
    candidate generation — cost O(docs · bands) instead of O(pairs);
    candidates are then *verified* with exact Jaccard so precision is 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .text import tokens


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup by content digest; keeps the smallest id as survivor.

    Returns (text_md5, keep_id, n_docs) — one row per distinct content.
    """
    return (
        df.select(F.md5(F.col(text_col)).alias("text_md5"), F.col(id_col))
        .groupBy("text_md5")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_docs"))
    )


def shingles(
    df: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Distinct word n-gram shingles per document → (id, shingle).

    Shingle construction happens inside ``transform`` over the token array
    (JVM lambda, no explode until the final step), then one explode+distinct.
    """
    toks = tokens(text_col)
    # 1-based element_at, i in [1, len-n+1]; empty array when the doc is shorter
    sh = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + F.lit(j)) for j in range(n)]
        ),
    )
    return (
        df.select(F.col(id_col).alias("doc_id"), F.explode(sh).alias("shingle"))
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    threshold: float,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity join → (doc_a, doc_b, jaccard).

    |A∩B| from the inverted-index self-join, |A|,|B| from per-doc shingle
    counts, J = i / (na + nb − i).  Every step is a hash join/agg on
    shingle or (doc_a, doc_b) keys — no cross product is ever materialized.
    """
    sh = shingles(df, n=n, text_col=text_col, id_col=id_col)
    if max_doc_freq is not None:
        freq = Window.partitionBy("shingle")
        sh = sh.withColumn("__df", F.count(F.lit(1)).over(freq)).filter(
            F.col("__df") <= max_doc_freq
        ).drop("__df")
    sh = sh.cache()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("i") / (F.col("na") + F.col("nb") - F.col("i")), 4
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= F.lit(threshold))
    )


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash + banded LSH candidate generation, exact-Jaccard verified.

    signatures: min over shingles of ``xxhash64(shingle, seed)`` per seed
    (one explode × num_hashes via a seed cross join — map-side, then a
    single hash-agg).  Bands of ``num_hashes/bands`` rows hash to buckets;
    docs sharing any bucket become candidates; candidates are verified with
    the exact Jaccard of their shingle sets, so output precision is exact —
    LSH only bounds recall (≥ 1−(1−t^r)^b).

    With 64 hashes / 16 bands (r=4), P[candidate] at J=0.8 is ≈ 0.9996.
    At 100 TB this is the scale path: cost O(docs·hashes), no all-pairs
    shingle join.
    """
    rows_per_band = num_hashes // bands
    sh = shingles(df, n=n, text_col=text_col, id_col=id_col).cache()

    seeds = df.sparkSession.range(num_hashes).select(
        F.col("id").cast("int").alias("seed")
    )
    sig = (
        sh.crossJoin(F.broadcast(seeds))
        .groupBy("doc_id", "seed")
        .agg(F.min(F.xxhash64("shingle", "seed")).alias("mh"))
    )
    buckets = (
        sig.withColumn("band", (F.col("seed") / F.lit(rows_per_band)).cast("int"))
        .groupBy("doc_id", "band")
        .agg(F.sort_array(F.collect_list(F.struct("seed", "mh"))).alias("sig"))
        .select(
            "doc_id", "band", F.xxhash64(F.to_json(F.col("sig"))).alias("bucket")
        )
    )
    ca = buckets.select(F.col("doc_id").alias("doc_a"), "band", "bucket")
    cb = buckets.select(F.col("doc_id").alias("doc_b"), "band", "bucket")
    candidates = (
        ca.join(cb, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )

    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(candidates, "doc_a")
        .join(b, ["shingle", "doc_b"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(F.col("i") / (F.col("na") + F.col("nb") - F.col("i")), 4).alias(
                "jaccard"
            ),
        )
        .filter(F.col("jaccard") >= F.lit(threshold))
    )


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64) -> DataFrame:
    """SimHash fingerprint per document → (doc_id, simhash).

    Each token hashes once (``xxhash64``); each of the 64 bit positions
    accumulates ±1 by that bit; the sign vector packs back into an int64.
    Plan: explode tokens ×64 bit positions → hash-agg.  At 100 TB, the
    ×64 row blowup makes this the one operator where an Arrow-batched
    pandas UDF (bit-twiddling in numpy per batch) can win; the DataFrame
    form is kept for its shuffle-free portability.
    """
    toks = F.explode(tokens(text_col))
    t = df.select(F.col(id_col).alias("doc_id"), toks.alias("tok")).withColumn(
        "h", F.xxhash64("tok")
    )
    bit = F.explode(F.sequence(F.lit(0), F.lit(bits - 1)))
    tb = t.select("doc_id", "h", bit.alias("bit"))
    weight = F.expr("CASE WHEN (shiftright(h, bit) & 1) = 1 THEN 1 ELSE -1 END")
    votes = tb.groupBy("doc_id", "bit").agg(F.sum(weight).alias("v"))
    bitval = F.expr(
        "CASE WHEN v > 0 THEN shiftleft(CAST(1 AS BIGINT), bit) ELSE CAST(0 AS BIGINT) END"
    )
    return votes.groupBy("doc_id").agg(F.sum(bitval).alias("simhash"))
