"""Market-basket association rules: support / confidence / lift.

The co-occurrence analytics a catalog or curation pipeline runs over
grouped facts — which items appear together in a basket (order, session,
document) more often than independence predicts.  Pure DataFrame
algebra: distinct basket-item pairs, a self-join on the basket key, and
two tiny dimension joins; the classic Apriori pruning is unnecessary at
pair depth because the candidate space is |items|², already bounded.

Scale posture: the self-join shuffles both sides on the basket key once
(co-partitioned, so the pair explosion happens locally per basket and is
bounded by Σ basket_size² — basket size is a data contract, not corpus
size).  Per-item counts and the basket total are broadcast; no
all-pairs-of-corpus anything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def basket_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: float = 0.0,
) -> DataFrame:
    """Pairwise association rules over (basket, item) rows.

    Returns one row per unordered item pair {a < b} with joint count
    ``n_ab``, ``support`` = n_ab/N (N = #distinct baskets),
    ``conf_a_to_b`` = n_ab/n_a, ``conf_b_to_a`` = n_ab/n_b, and
    ``lift`` = support / (supp_a · supp_b) — lift > 1 means the pair
    co-occurs more than independent items would.  Pairs below
    ``min_support`` are dropped.  Duplicate (basket, item) input rows
    are collapsed first (a basket holds a SET of items).
    """
    b = df.select(
        F.col(basket_col).alias("bk"), F.col(item_col).alias("item")
    ).distinct()
    n_total = b.agg(F.countDistinct("bk").alias("n_baskets"))
    item_n = b.groupBy("item").agg(F.count(F.lit(1)).alias("n_item"))
    pairs = (
        b.alias("x")
        .join(b.alias("y"), "bk")
        .filter(F.col("x.item") < F.col("y.item"))
        .groupBy(
            F.col("x.item").alias("item_a"), F.col("y.item").alias("item_b")
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    out = (
        pairs.join(
            F.broadcast(item_n.withColumnRenamed("item", "item_a")
                        .withColumnRenamed("n_item", "n_a")),
            "item_a",
        )
        .join(
            F.broadcast(item_n.withColumnRenamed("item", "item_b")
                        .withColumnRenamed("n_item", "n_b")),
            "item_b",
        )
        .crossJoin(F.broadcast(n_total))
    )
    support = F.col("n_ab") / F.col("n_baskets")
    return out.filter(support >= F.lit(min_support)).select(
        "item_a",
        "item_b",
        F.col("n_ab").cast("bigint").alias("n_ab"),
        support.alias("support"),
        (F.col("n_ab") / F.col("n_a")).alias("conf_a_to_b"),
        (F.col("n_ab") / F.col("n_b")).alias("conf_b_to_a"),
        (
            F.col("n_ab") * F.col("n_baskets") / (F.col("n_a") * F.col("n_b"))
        ).alias("lift"),
    )
