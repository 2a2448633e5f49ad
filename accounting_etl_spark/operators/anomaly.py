"""Robust per-key anomaly flagging — median/MAD outlier detection in
exact integer math, hash-portable across engines.

Mean/stddev z-scores break on the data they're meant to find (one
huge outlier inflates sigma until nothing is anomalous) and float
aggregation order makes them engine-unportable besides. The robust
standard is the median/MAD pair: an observation is anomalous when
``|x - median| > k * MAD``. Everything here is integer arithmetic
over a quantized value column, so a DuckDB twin reproduces the exact
flags and scores.

Exact medians at scale: the classic trap is a per-key global sort.
Instead the LOWER median is computed over the per-key DISTINCT-VALUE
histogram — ``groupBy(key, value).count`` (a map-side-combining
shuffle), then a cumulative window over the distinct values of each
key.  The window's partition size is the key's distinct-value count,
NOT its row count — bounded for quantized/categorical domains (money
cents, latencies in ms, scores). For genuinely unbounded domains,
quantize first: that is part of the contract (the flags are then on
the quantized value, as documented).

The MAD pass reuses the same machinery on ``|x - median|``; the
lower-median convention (smallest value whose cumulative count
reaches ``(n+1) // 2``) is what makes both engines agree without
interpolation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def lower_median(df: DataFrame, key: str, val: str) -> DataFrame:
    """Exact per-key LOWER median of an integer column: the smallest
    value whose cumulative frequency reaches ``(n + 1) // 2``.
    Returns ``(key, med)``. One shuffle (histogram) + one
    distinct-value-bounded window.
    """
    hist = df.groupBy(key, val).agg(F.count(F.lit(1)).alias("__c"))
    by_val = (
        Window.partitionBy(key)
        .orderBy(val)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    whole = Window.partitionBy(key)
    ranked = hist.select(
        key,
        val,
        F.sum("__c").over(by_val).alias("__cum"),
        F.sum("__c").over(whole).alias("__tot"),
    )
    return (
        ranked.where(F.expr("__cum >= (__tot + 1) div 2"))
        .groupBy(key)
        .agg(F.min(val).alias("med"))
    )


def robust_flags(
    df: DataFrame,
    key: str,
    val: str,
    *,
    z_milli_threshold: int = 5000,
) -> DataFrame:
    """Median/MAD anomaly flags over an INTEGER value column.

    Per key: ``med`` = lower median, ``mad`` = lower median of
    ``|x - med|``; every input row gains ``z_milli = (|x - med| *
    1000) div max(mad, 1)`` and rows with ``z_milli >=
    z_milli_threshold`` are returned (threshold 5000 = 5 MADs).
    All original columns are preserved.
    """
    med = lower_median(df, key, val)
    with_med = df.join(med, key)
    dev = with_med.withColumn(
        "__dev", F.abs(F.col(val) - F.col("med"))
    )
    mad = lower_median(dev, key, "__dev").select(
        key, F.col("med").alias("mad")
    )
    scored = dev.join(mad, key).withColumn(
        "z_milli",
        F.expr("(__dev * 1000) div greatest(mad, 1)").cast("bigint"),
    )
    return scored.where(
        F.col("z_milli") >= F.lit(int(z_milli_threshold))
    ).drop("__dev")
