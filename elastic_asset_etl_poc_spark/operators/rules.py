"""Market-basket association rules: support / confidence / lift.

The co-occurrence analytics a catalog or curation pipeline runs over
grouped facts — which items appear together in a basket (order, session,
document) more often than independence predicts.  Pure DataFrame
algebra: distinct basket-item pairs, a self-join on the basket key, and
two tiny dimension joins; the classic Apriori pruning is unnecessary at
pair depth because the candidate space is |items|², already bounded.

Scale posture: ONE corpus shuffle collapses each basket to its item SET;
pair generation is then a map-side double-explode over the (sorted)
array — bounded by Σ basket_size², where basket size is a data contract,
not corpus size — feeding a map-side-combined pair count whose shuffle
carries at most |items|² rows.  Per-item counts and the basket total are
broadcast; no basket-key self-join, no all-pairs-of-corpus anything.
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
    sets = (
        df.groupBy(F.col(basket_col).alias("bk"))
        .agg(F.collect_set(F.col(item_col)).alias("items"))
        .select("bk", F.array_sort("items").alias("items"))
    )
    n_total = sets.agg(F.count(F.lit(1)).alias("n_baskets"))
    item_n = (
        sets.select(F.explode("items").alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("n_item"))
    )
    pairs = (
        sets.select(F.explode("items").alias("item_a"), "items")
        .select(
            "item_a",
            F.explode(
                F.filter("items", lambda x: x > F.col("item_a"))
            ).alias("item_b"),
        )
        .groupBy("item_a", "item_b")
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
