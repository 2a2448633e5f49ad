"""Layout tests: partition pruning and shuffle-free co-bucketed joins
— the physical-plan checks behind the 100 TB posture (COVERAGE.md).
"""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_partitioned_write_prunes(spark, tmp_path):
    from accounting_etl_spark.sinks.tables import write_partitioned
    from accounting_etl_spark.sources.tables import load_table

    orders = load_table(spark, SF_SMOKE, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    out = str(tmp_path / "orders_part")
    write_partitioned(orders, out, partition_by=["order_year"])

    read = spark.read.parquet(out).filter(F.col("order_year") == 1996)
    plan = read._jdf.queryExecution().executedPlan().toString()
    # the filter must reach the scan as a PARTITION filter (directory
    # pruning), not a data filter
    assert "PartitionFilters" in plan and "order_year" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0]
    got = read.count()
    expect = orders.filter(F.col("order_year") == 1996).count()
    assert got == expect > 0


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    from accounting_etl_spark.sinks.tables import (
        co_located_join,
        write_bucketed,
    )
    from accounting_etl_spark.sources.tables import load_table

    suffix = uuid.uuid4().hex[:8]
    lt, rt = f"li_b_{suffix}", f"or_b_{suffix}"
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    orders = load_table(spark, SF_SMOKE, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    try:
        write_bucketed(li, lt, bucket_by="l_orderkey", n_buckets=8,
                       path=str(tmp_path / lt))
        write_bucketed(orders, rt, bucket_by="l_orderkey", n_buckets=8,
                       path=str(tmp_path / rt))
        # co-bucketed join: no shuffle exchange on either side
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
        try:
            joined = co_located_join(spark, lt, rt, "l_orderkey")
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
            assert "Exchange hashpartitioning" not in plan, plan
            assert joined.count() == li.count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {lt}")
        spark.sql(f"DROP TABLE IF EXISTS {rt}")
