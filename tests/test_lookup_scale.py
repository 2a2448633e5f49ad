"""Tier-2 scale path: the trigram prefilter must be candidate-safe —
identical output to the broadcast nested-loop strategy.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _run(spark, prefilter):
    from accounting_etl_spark.operators.lookup_join import two_tier_lookup_join
    from accounting_etl_spark.sources.tables import load_table

    part = load_table(spark, SF_SMOKE, "part")
    exact = part.filter(F.col("p_partkey") % 5 == 0).select(
        F.col("p_name").alias("vendor"), F.col("p_partkey").alias("ref")
    )
    fuzzy = part.filter(F.col("p_partkey") % 7 == 0).select(
        F.concat(F.lit("ACME "), F.col("p_name")).alias("vendor"),
        F.col("p_partkey").alias("ref"),
    )
    dim = (
        exact.unionByName(fuzzy)
        .groupBy("vendor")
        .agg(F.min("ref").cast("bigint").alias("dim_ref"))
    )
    out = two_tier_lookup_join(
        part.select("p_partkey", "p_name"),
        dim,
        fact_id="p_partkey",
        fact_key="p_name",
        dim_key="vendor",
        dim_cols=["dim_ref"],
        prefilter=prefilter,
    )
    return sorted(map(tuple, out.collect()))


def test_trigram_prefilter_equals_broadcast(spark):
    assert _run(spark, "trigram") == _run(spark, "broadcast")


def test_trigram_short_keys_still_match(spark):
    """Keys shorter than 3 chars fall back to whole-string grams and
    must still find containment matches."""
    from accounting_etl_spark.operators.lookup_join import two_tier_lookup_join

    fact = spark.createDataFrame(
        [(1, "ab"), (2, "zz")], "id bigint, k string"
    )
    dim = spark.createDataFrame(
        [("xxabyy", "D1"), ("other", "D2")], "v string, tag string"
    )
    out = {
        r.id: (r.tier, r.v)
        for r in two_tier_lookup_join(
            fact, dim, fact_id="id", fact_key="k", dim_key="v",
            dim_cols=["tag"], prefilter="trigram",
        ).collect()
    }
    assert out[1] == (2, "xxabyy")
    assert out[2][0] == 0
