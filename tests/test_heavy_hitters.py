"""Heavy hitters (operators/heavy_hitters.py): the Misra–Gries
guarantee and exact-count verification."""

from __future__ import annotations

from pyspark.sql import functions as F

from accounting_etl_spark.operators.heavy_hitters import heavy_hitters


def _zipf(spark, n=50_000, n_keys=5_000):
    # deterministic skew: key = id mod bucket with quadratic bias
    df = spark.range(0, n).select(
        (F.pmod(F.col("id") * F.col("id") + F.col("id"), F.lit(n_keys)))
        .cast("string")
        .alias("k"),
        F.lit(1).alias("one"),
    )
    # inject true heavy keys
    heavy = spark.range(0, 6000).select(
        F.concat(F.lit("HOT"), (F.col("id") % 3).cast("string")).alias("k"),
        F.lit(1).alias("one"),
    )
    return df.union(heavy)


def test_every_frequent_key_is_found_with_exact_count(spark):
    df = _zipf(spark).repartition(8)
    n = df.count()
    capacity = 256
    got = {r["k"]: r["count"] for r in heavy_hitters(df, key_col="k", capacity=capacity).collect()}
    exact = {
        r["k"]: r["n"]
        for r in df.groupBy("k").agg(F.count("*").alias("n")).collect()
    }
    threshold = n / capacity
    for k, c in exact.items():
        if c > threshold:
            assert k in got, f"missed frequent key {k} (count {c})"
    # all reported counts are EXACT
    for k, c in got.items():
        assert c == exact[k], (k, c, exact[k])
    # the three injected hot keys are found
    assert {"HOT0", "HOT1", "HOT2"} <= set(got)


def test_min_count_filter_and_bounded_candidates(spark):
    df = _zipf(spark).repartition(4)
    out = heavy_hitters(df, key_col="k", capacity=64, min_count=500)
    rows = out.collect()
    assert all(r["count"] >= 500 for r in rows)
    assert {r["k"] for r in rows} >= {"HOT0", "HOT1", "HOT2"}
