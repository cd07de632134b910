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

    All-pairs kernel as an Arrow-batched numpy matmul: one side is
    broadcast as a normalized matrix (the build side, same size discipline
    as a broadcast join); each partition's batch multiplies against it —
    O(N²·d) in BLAS instead of an interpreted per-element fold (measured
    10×+ faster than the zip_with/aggregate form at 2k×64).  At corpus
    scale the same kernel runs over LSH-bucketed blocks (lsh_topk's
    signature stage) instead of the full matrix.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    rows = embeddings.select(id_col, vec_col).collect()  # build side (broadcast-sized)
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    m = np.array([r[1] for r in rows], dtype=np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    bc = embeddings.sparkSession.sparkContext.broadcast((ids, m))

    out_schema = T.StructType(
        [
            T.StructField("vec_a", T.LongType()),
            T.StructField("vec_b", T.LongType()),
            T.StructField("cos", T.DoubleType()),
        ]
    )

    def batches(it):
        b_ids, b_m = bc.value
        for pdf in it:
            a_ids = pdf[id_col].to_numpy(dtype=np.int64)
            a = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            a /= np.linalg.norm(a, axis=1, keepdims=True)
            sims = a @ b_m.T
            ai, bi = np.nonzero((sims >= threshold) & (a_ids[:, None] < b_ids[None, :]))
            yield pd.DataFrame(
                {
                    "vec_a": a_ids[ai],
                    "vec_b": b_ids[bi],
                    "cos": np.round(sims[ai, bi], 4),
                }
            )

    return embeddings.select(id_col, vec_col).mapInPandas(batches, out_schema)
