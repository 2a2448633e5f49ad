"""Market-basket association rules — support / confidence / lift
over (basket, item) pairs, in exact integer arithmetic.

The classic co-purchase analysis ("orders containing X also contain
Y"), and the same statistics rank feature co-occurrence in any
bag-of-things corpus. All three measures are ratios of integer
counts, carried here as scaled integers so two engines produce
identical bits: ``confidence_milli = (c_xy * 1000) div c_x`` and
``lift_scaled = (c_xy * n_baskets * scale) div (c_x * c_y)`` (lift
> ``scale`` means positively associated).

Scale shape (hot-basket safe):

1. **A-priori prefilter** — a pair can only reach ``c_xy >=
   min_support`` if BOTH members individually occur in at least
   ``min_support`` baskets, so infrequent items are semi-joined
   away BEFORE any pair is generated. Exact: every pruned pair
   would have failed the support filter anyway.
2. **Chunked local pair expansion** — baskets collapse to one
   sorted item array each and ordered pairs are generated through
   ``functions/pairs.py::explode_bucket_pairs``: the array is cut
   into ``max_basket_chunk``-sized chunks whose index pairs explode
   into separate rows first, so a hot basket (a crawler session
   with 10^5 items) never materializes its n^2 pairs in one row or
   one shuffle key — per-row memory is O(max_basket_chunk^2).
3. The basket total stays a 1-row aggregate cross-joined broadcast
   — never a driver action — and the lift product carries an
   explicit int64 overflow guard (raise, not silent wrap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.pairs import explode_bucket_pairs

_I64_MAX = (1 << 63) - 1


def association_rules(
    bi: DataFrame,
    basket_col: str,
    item_col: str,
    *,
    min_support: int = 2,
    scale: int = 10**6,
    max_basket_chunk: int = 1024,
) -> DataFrame:
    """Directed rules over every co-occurring item pair with
    ``c_xy >= min_support``: ``(antecedent, consequent, c_xy, c_x,
    c_y, conf_milli, lift_scaled)`` — both directions of each
    unordered pair."""
    if min_support < 1:
        raise ValueError("min_support must be >= 1")
    if max_basket_chunk < 2:
        raise ValueError("max_basket_chunk must be >= 2")
    if not 1 <= scale <= _I64_MAX:
        raise ValueError("scale must fit in int64")
    b = bi.select(
        F.col(basket_col).alias("__b"), F.col(item_col).alias("__i")
    ).distinct()
    items = b.groupBy(F.col("__i").alias("item")).agg(
        F.count(F.lit(1)).alias("c")
    )
    nb = b.select("__b").distinct().agg(
        F.count(F.lit(1)).alias("__nb")
    )
    # a-priori prefilter: drop items that cannot be a member of any
    # frequent pair before pair generation ever runs
    fb = b
    if min_support > 1:
        freq = items.where(F.col("c") >= min_support).select(
            F.col("item").alias("__i")
        )
        fb = b.join(freq, "__i", "left_semi")
    # one sorted item array per basket; contiguous slices of the
    # sorted array make every chunk-expanded pair already ordered
    # (a < b), matching the classic x.i < y.i self-join exactly
    baskets = (
        fb.groupBy("__b")
        .agg(F.sort_array(F.collect_set("__i")).alias("__items"))
        .where(F.size("__items") >= 2)
    )
    pairs = (
        explode_bucket_pairs(
            baskets,
            "__items",
            lambda x, y: F.struct(x.alias("a"), y.alias("b")),
            max_basket_chunk,
        )
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
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
    # lift product c_xy * nb * scale can exceed int64 on large
    # corpora (c_xy ~ 1e7, nb ~ 1e7, scale 1e6): guard factor by
    # factor (div never overflows) and raise rather than wrap
    lift_num_ok = (
        f"(__nb <= {_I64_MAX} div CAST({int(scale)} AS BIGINT))"
        f" AND (c_xy <= {_I64_MAX} div"
        f" (__nb * CAST({int(scale)} AS BIGINT)))"
    )
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
                f"CASE WHEN {lift_num_ok} THEN"
                f" (c_xy * __nb * CAST({int(scale)} AS BIGINT))"
                " div (c_x * c_y)"
                " ELSE raise_error('association_rules: lift_scaled"
                " overflows int64 — reduce scale') END"
            ).alias("lift_scaled"),
        )
    )
