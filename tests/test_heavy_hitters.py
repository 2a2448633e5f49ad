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


def test_null_keys_are_excluded_not_crashed(spark):
    df = _zipf(spark, n=5_000, n_keys=500).union(
        spark.range(0, 400).select(
            F.lit(None).cast("string").alias("k"), F.lit(1).alias("one")
        )
    )
    got = {
        r["k"]
        for r in heavy_hitters(df, key_col="k", capacity=64).collect()
    }
    assert None not in got
    assert {"HOT0", "HOT1", "HOT2"} <= got


def test_shuffled_fallback_when_candidates_exceed_broadcast_limit(spark):
    df = _zipf(spark, n=20_000, n_keys=2_000).repartition(4)
    hinted = heavy_hitters(df, key_col="k", capacity=128)
    gated = heavy_hitters(df, key_col="k", capacity=128, broadcast_limit=0)
    # the gate must withhold the broadcast HINT (a forced hint never
    # falls back); AQE may still choose a runtime broadcast when the
    # measured size is small — that is the desired at-scale behavior,
    # so assert on the analyzed plan's hints, not the physical join
    hinted_plan = hinted._jdf.queryExecution().analyzed().toString()
    gated_plan = gated._jdf.queryExecution().analyzed().toString()
    assert "UnresolvedHint broadcast" in hinted_plan or "hints=[broadcast" in hinted_plan.lower() or "ResolvedHint" in hinted_plan, hinted_plan[:2000]
    assert "ResolvedHint" not in gated_plan and "broadcast" not in gated_plan.lower(), gated_plan[:2000]
    assert sorted(map(tuple, hinted.collect())) == sorted(
        map(tuple, gated.collect())
    )
