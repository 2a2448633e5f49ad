"""Market-basket association rules — support / confidence / lift
over (basket, item) pairs, in exact integer arithmetic.

The classic co-purchase analysis ("orders containing X also contain
Y"), and the same statistics rank feature co-occurrence in any
bag-of-things corpus. All three measures are ratios of integer
counts, carried here as scaled integers so two engines produce
identical bits: ``confidence_milli = (c_xy * 1000) div c_x`` and
``lift_scaled = (c_xy * n_baskets * scale) div (c_x * c_y)`` (lift
> ``scale`` means positively associated).

Shape: one distinct pass over (basket, item), one item-count
aggregate, one within-basket self-join for pair counts (fan-out
bounded by basket size squared — retail baskets are small; for
web-scale baskets route through the chunked posting-list expansion
of functions/pairs.py instead), and a min-support filter BEFORE the
count joins so the rule table never carries the hapax-pair tail.
The basket total stays a 1-row aggregate cross-joined broadcast —
never a driver action.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def association_rules(
    bi: DataFrame,
    basket_col: str,
    item_col: str,
    *,
    min_support: int = 2,
    scale: int = 10**6,
) -> DataFrame:
    """Directed rules over every co-occurring item pair with
    ``c_xy >= min_support``: ``(antecedent, consequent, c_xy, c_x,
    c_y, conf_milli, lift_scaled)`` — both directions of each
    unordered pair."""
    if min_support < 1:
        raise ValueError("min_support must be >= 1")
    b = bi.select(
        F.col(basket_col).alias("__b"), F.col(item_col).alias("__i")
    ).distinct()
    items = b.groupBy(F.col("__i").alias("item")).agg(
        F.count(F.lit(1)).alias("c")
    )
    nb = b.select("__b").distinct().agg(
        F.count(F.lit(1)).alias("__nb")
    )
    pairs = (
        b.alias("x")
        .join(
            b.alias("y"),
            (F.col("x.__b") == F.col("y.__b"))
            & (F.col("x.__i") < F.col("y.__i")),
        )
        .groupBy(
            F.col("x.__i").alias("a"), F.col("y.__i").alias("b")
        )
        .agg(F.count(F.lit(1)).alias("c_xy"))
        .where(F.col("c_xy") >= min_support)
    )
    directed = pairs.select("a", "b", "c_xy").unionAll(
        pairs.select(
            F.col("b").alias("a"), F.col("a").alias("b"), "c_xy"
        )
    )
    ca = items.select(F.col("item").alias("a"), F.col("c").alias("c_x"))
    cb = items.select(F.col("item").alias("b"), F.col("c").alias("c_y"))
    return (
        directed.join(ca, "a")
        .join(cb, "b")
        .crossJoin(F.broadcast(nb))
        .select(
            F.col("a").alias("antecedent"),
            F.col("b").alias("consequent"),
            "c_xy",
            "c_x",
            "c_y",
            F.expr("(c_xy * 1000) div c_x").alias("conf_milli"),
            F.expr(
                f"(c_xy * __nb * CAST({int(scale)} AS BIGINT))"
                " div (c_x * c_y)"
            ).alias("lift_scaled"),
        )
    )
