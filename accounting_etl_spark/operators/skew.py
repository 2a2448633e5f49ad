"""Join-fanout profiling — the pre-flight skew diagnostic for big
equi-joins.

Before running a 100 TB join you want to know what it will produce:
the exact output cardinality is ``Σ_k c_left(k) * c_right(k)`` over
the shared keys, and the per-key terms ARE the skew profile — one
hot key with 10^5 rows on each side contributes 10^10 output rows
and will dominate a shuffle partition unless it is salted
(operators/salting.py) or isolated by AQE's skew-join split. This
operator computes that profile WITHOUT running the join: one
aggregate per side (map-side combining) and a join of the two COUNT
tables, whose size is the distinct-key count, never the data size.

The numbers are exact integers (counts and products), hash-portable
by construction. Product overflow means the join itself is
impossible (>= 2^63 output rows), so overflow is out of contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def join_fanout_profile(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str | None = None,
) -> DataFrame:
    """Per-key equi-join fanout: ``(key, n_left, n_right, fanout)``
    for every key present on BOTH sides (only those produce output
    rows). NULL keys never match in an equi-join and are excluded.
    The join's exact output cardinality is ``sum(fanout)``."""
    right_key = right_key or left_key
    cl = (
        left.where(F.col(left_key).isNotNull())
        .groupBy(F.col(left_key).alias("key"))
        .agg(F.count(F.lit(1)).alias("n_left"))
    )
    cr = (
        right.where(F.col(right_key).isNotNull())
        .groupBy(F.col(right_key).alias("key"))
        .agg(F.count(F.lit(1)).alias("n_right"))
    )
    return cl.join(cr, "key").select(
        "key",
        "n_left",
        "n_right",
        (F.col("n_left") * F.col("n_right")).alias("fanout"),
    )
