"""Interval / range join via bucketization.

Spark has no native range join: ``a JOIN b ON |a.t - b.t| <= W``
plans as a broadcast-nested-loop (quadratic) if written directly. The
scalable decomposition: bucket the range key by the window width,
explode ONE side into its bucket and the two neighbors, equi-join on
(key, bucket), then apply the exact range predicate. Every true pair
lands in at least one shared bucket (|ta - tb| <= W means their
buckets differ by at most 1), the join is a plain shuffle-hash on
(key, bucket), and the candidate blowup is bounded by 3x plus
bucket-occupancy — the same trick DBs use for IEJoin fallbacks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_self_join(
    df: DataFrame,
    *,
    key: str,
    time_col: str,
    id_col: str,
    window: int,
    payload: list[str] | None = None,
) -> DataFrame:
    """Pairs (id_a < id_b) within ``window`` of each other per key.

    ``time_col`` must be integral (µs/seconds); exact arithmetic only.
    Returns key, id_a, id_b, dt (b - a, may be negative), plus
    ``payload`` columns from each side suffixed _a/_b.
    """
    payload = payload or []
    base = df.select(
        F.col(key).alias("__k"),
        F.col(id_col).alias("__id"),
        F.col(time_col).alias("__t"),
        # integer DIV, not float division — µs epochs flirt with 2^53
        F.expr(f"CAST(`{time_col}` DIV {int(window)} AS BIGINT)").alias("__b"),
        *[F.col(c) for c in payload],
    )
    left = base.select(
        "__k", "__id", "__t", *[F.col(c).alias(f"{c}_a") for c in payload],
        F.explode(
            F.array(F.col("__b") - 1, F.col("__b"), F.col("__b") + 1)
        ).alias("__bj"),
    )
    right = base.select(
        F.col("__k").alias("__k2"),
        F.col("__id").alias("__id2"),
        F.col("__t").alias("__t2"),
        F.col("__b").alias("__bj"),
        *[F.col(c).alias(f"{c}_b") for c in payload],
    )
    return (
        left.join(
            right,
            (F.col("__k") == F.col("__k2")) & (left["__bj"] == right["__bj"]),
        )
        .filter(
            (F.col("__id") < F.col("__id2"))
            & (F.abs(F.col("__t2") - F.col("__t")) <= window)
        )
        .select(
            F.col("__k").alias(key),
            F.col("__id").alias("id_a"),
            F.col("__id2").alias("id_b"),
            (F.col("__t2") - F.col("__t")).alias("dt"),
            *[F.col(f"{c}_a") for c in payload],
            *[F.col(f"{c}_b") for c in payload],
        )
    )
    # No trailing distinct: only the LEFT side explodes into the three
    # neighbor buckets while the right keeps its single home bucket, so
    # each (a, b) candidate meets on exactly one __bj (= b's bucket) and
    # the id_a < id_b predicate removes the mirrored ordering — the join
    # emits every true pair exactly once by construction.
