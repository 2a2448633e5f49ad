"""Skew-mitigating two-phase aggregation (salting).

At 100 TB a groupBy on a skewed key (one vendor with 10% of all
transactions, one hot shingle) funnels a whole key into one reducer.
Salting splits each key into ``num_salts`` sub-keys for a partial
aggregate, then re-aggregates the partials — the hot key's work
spreads across ``num_salts`` tasks and the second shuffle carries
only ``|keys| × num_salts`` rows.

Only algebraic aggregates decompose this way: sum/count re-merge by
sum, min/max by min/max. (AQE's skew-join handling covers the join
side; this covers aggregation skew, which AQE does not re-plan.)

The salt is ``pmod(xxhash64(all columns), num_salts)`` — content-
derived, so reruns are deterministic (no rand(); SURVEY §7 watch
list) and rows of the same group scatter uniformly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MERGE = {
    "sum": F.sum,
    "count": F.sum,  # counts re-merge by summing partial counts
    "min": F.min,
    "max": F.max,
}
_PARTIAL = {
    "sum": F.sum,
    "count": lambda c: F.count(c),
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[tuple[str, str, str]],
    *,
    num_salts: int = 32,
) -> DataFrame:
    """Two-phase skew-safe groupBy.

    ``aggs``: list of (output_name, kind, column) with kind in
    {sum, count, min, max}. Sums over doubles should pre-cast to
    decimal (functions/detsum.py) — salting reorders reduction and
    decimal is the only order-independent money type.
    """
    bad = [k for _, k, _ in aggs if k not in _MERGE]
    if bad:
        raise ValueError(f"non-decomposable aggregate kinds: {bad}")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(num_salts))
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(*[_PARTIAL[k](c).alias(name) for name, k, c in aggs])
    )
    return partial.groupBy(*keys).agg(
        *[_MERGE[k](name).alias(name) for name, k, _ in aggs]
    )
