"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k as the exact baseline, and a random-hyperplane
LSH-bucketed variant as the scale path.  Dot products run JVM-side via
``zip_with``/``aggregate`` higher-order functions — vectorized enough at
64 dims; a deployment chasing the last 2-3× on 1024-dim vectors would swap
the kernel for an Arrow pandas UDF (numpy matmul per batch) without
touching the surrounding plan.

Scale posture: the query side is always the small side — broadcast it.
Brute force is O(N·Q) dot products with zero shuffle (map-side only,
then a top-k window per query).  LSH cuts the candidate set per query to
its probe buckets: O(N) bucketing once + O(candidates) per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k → (query_id, neighbor_id, rank).

    ``queries`` is broadcast; every embedding partition scores locally;
    one window per query_id takes the top k.  Ranks use (cosine DESC,
    neighbor_id ASC) so ties are deterministic.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    e = embeddings.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("ev")
    )
    scored = e.crossJoin(F.broadcast(q)).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    cos = (_dot(F.col("ev"), F.col("qv")) / (_norm(F.col("ev")) * _norm(F.col("qv")))).alias(
        "cos"
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.select("query_id", "neighbor_id", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def _hyperplane(dim: int, plane: int):
    """Deterministic pseudo-random hyperplane component: a fixed integer
    hash of (plane, dim-index) mapped to [-0.5, 0.5).  JVM-side, seedless,
    reproducible across runs and cluster sizes."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda d: (
            F.pmod(F.xxhash64(F.lit(plane) * F.lit(100003) + d), F.lit(100000)) / 100000.0
            - 0.5
        ),
    )


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane (sign) LSH ANN → (query_id, neighbor_id, rank).

    Each vector gets a ``planes``-bit signature (sign of dot with fixed
    pseudo-random hyperplanes); candidates share the exact bucket; exact
    cosine re-ranks candidates.  Approximate: recall < 1 by design — pair
    with :func:`cosine_topk` when auditing recall.  For multi-probe, raise
    ``planes`` and hash bands of signs instead (same plan shape).
    """
    dim = len(embeddings.select(vec_col).first()[0])

    def signature(vec):
        bits = [
            F.when(_dot(vec, _hyperplane(dim, p)) >= 0, F.lit(1)).otherwise(F.lit(0))
            * F.lit(2**p)
            for p in range(planes)
        ]
        out = bits[0]
        for b in bits[1:]:
            out = out + b
        return out

    e = embeddings.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("ev")
    ).withColumn("bucket", signature(F.col("ev")))
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    ).withColumn("bucket", signature(F.col("qv")))

    cand = e.join(F.broadcast(q), "bucket").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    cos = (_dot(F.col("ev"), F.col("qv")) / (_norm(F.col("ev")) * _norm(F.col("qv")))).alias(
        "cos"
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        cand.select("query_id", "neighbor_id", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def cosine_pairs(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs → (vec_a, vec_b, cos).

    Exact all-pairs baseline: block-nested-loop over pre-normalized
    vectors (norms computed once, map-side).  At corpus scale the same
    contract runs with LSH bucketing (:func:`lsh_topk`'s signature stage)
    to bound candidates; this exact form is the oracle-checkable baseline
    and the verifier for the approximate path.
    """
    e = embeddings.select(
        F.col(id_col).alias("vec_a"), _as_double(F.col(vec_col)).alias("va")
    ).withColumn("na", _norm(F.col("va")))
    f = embeddings.select(
        F.col(id_col).alias("vec_b"), _as_double(F.col(vec_col)).alias("vb")
    ).withColumn("nb", _norm(F.col("vb")))
    joined = e.join(f, F.col("vec_a") < F.col("vec_b"))
    cos = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        joined.select("vec_a", "vec_b", cos.alias("cos"))
        .filter(F.col("cos") >= F.lit(threshold))
        .select("vec_a", "vec_b", F.round(F.col("cos"), 4).alias("cos"))
    )
