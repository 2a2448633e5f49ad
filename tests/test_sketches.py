"""Approximate sketches vs exact: relative-error bounds."""

from __future__ import annotations

from tests.conftest import SF_ORACLE


def test_sketch_error_bounds(spark):
    from accounting_etl_spark.queries.analytics import (
        q_approx_sketches,
        q_percentiles,
    )

    # the sketches entry is union-tagged (variant, grp, n, v1..v3);
    # the 'sketch' variant carries (approx_cust, approx_median,
    # approx_p90) as (v1, v2, v3) keyed by o_orderpriority in grp
    approx = (
        q_approx_sketches(spark, SF_ORACLE).toPandas().set_index("grp")
    )
    assert (approx["variant"] == "sketch").all()
    exact = (
        q_percentiles(spark, SF_ORACLE).toPandas().set_index("o_orderpriority")
    )
    for prio in exact.index:
        # v1 counts DISTINCT customers <= n orders; compare medians
        # instead for the quantile sketch
        assert approx.loc[prio, "v1"] > 0
        med_rel = abs(
            approx.loc[prio, "v2"] - exact.loc[prio, "median_price"]
        ) / exact.loc[prio, "median_price"]
        p90_rel = abs(
            approx.loc[prio, "v3"] - exact.loc[prio, "p90_price"]
        ) / exact.loc[prio, "p90_price"]
        assert med_rel < 0.05, f"{prio}: median off {med_rel:.3f}"
        assert p90_rel < 0.05, f"{prio}: p90 off {p90_rel:.3f}"


def test_hll_close_to_exact_distinct(spark):
    from pyspark.sql import functions as F

    from accounting_etl_spark.sources.tables import load_table

    orders = load_table(spark, SF_ORACLE, "orders")
    exact = orders.select(F.countDistinct("o_custkey")).collect()[0][0]
    approx = orders.select(F.approx_count_distinct("o_custkey")).collect()[0][0]
    assert abs(approx - exact) / exact < 0.15
