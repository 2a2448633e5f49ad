"""Token-budget selection (operators/budget.py) and the multi-column
descending-order generalization of the distributed prefix-sum it
relies on."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from accounting_etl_spark.operators.budget import select_token_budget
from accounting_etl_spark.operators.packing import prefix_sum


def _scored(spark, n=500):
    # deterministic irregular (quality, size) pairs with quality ties
    # (q collides every 17 ids) so the doc_id tie-break is exercised
    rows = [
        (i, float((i * 7) % 17), 1 + (i * i) % 41) for i in range(n)
    ]
    rows = rows[1::2] + rows[0::2]
    return spark.createDataFrame(rows, ["doc_id", "q", "n_tokens"]).repartition(7)


def test_prefix_sum_desc_multicol_matches_window(spark):
    df = _scored(spark)
    got = prefix_sum(
        df,
        order_col=[F.col("q").desc(), F.col("doc_id")],
        value_col="n_tokens",
        num_partitions=8,
    )
    w = Window.orderBy(F.col("q").desc(), F.col("doc_id")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = df.withColumn("cum", F.sum("n_tokens").over(w))
    assert (
        got.select("doc_id", "cum").sort("doc_id").collect()
        == want.select("doc_id", "cum").sort("doc_id").collect()
    )


def test_budget_absolute(spark):
    df = _scored(spark)
    out = select_token_budget(
        df,
        order_col=[F.col("q").desc(), F.col("doc_id")],
        size_col="n_tokens",
        budget=1000,
        num_partitions=8,
    ).collect()
    kept = [r for r in out if r.keep]
    dropped = [r for r in out if not r.keep]
    assert kept and dropped
    # the kept set is exactly the prefix: every kept cum <= budget,
    # every dropped cum > budget, and the kept prefix is contiguous in
    # the (q desc, doc_id) order
    assert max(r.cum_tokens for r in kept) <= 1000
    assert min(r.cum_tokens for r in dropped) > 1000
    last_kept = max(kept, key=lambda r: (-r.q, r.doc_id))
    first_drop = min(dropped, key=lambda r: (-r.q, r.doc_id))
    assert (-last_kept.q, last_kept.doc_id) < (-first_drop.q, first_drop.doc_id)


def test_budget_fraction_by_tokens(spark):
    df = _scored(spark)
    out = select_token_budget(
        df,
        order_col=[F.col("q").desc(), F.col("doc_id")],
        size_col="n_tokens",
        budget_frac=(1, 2),
        num_partitions=8,
    ).collect()
    total = sum(r.n_tokens for r in out)
    kept_tok = sum(r.n_tokens for r in out if r.keep)
    # kept half by tokens: within one boundary document of total/2 —
    # adding the NEXT document in (q desc, doc_id) order would exceed it
    assert kept_tok * 2 <= total
    first_drop = min(
        (r for r in out if not r.keep), key=lambda r: (-r.q, r.doc_id)
    )
    assert (kept_tok + first_drop.n_tokens) * 2 > total


def test_budget_requires_exactly_one_mode(spark):
    df = _scored(spark, n=10)
    with pytest.raises(ValueError):
        select_token_budget(df, order_col="doc_id")
    with pytest.raises(ValueError):
        select_token_budget(
            df, order_col="doc_id", budget=10, budget_frac=(1, 2)
        )


def test_budget_plan_no_global_window(spark):
    """Same 100 TB pin as the packing prefix-sum: every window in the
    plan keys on __pid (bounded per-partition state) — never an
    unpartitioned data-sized sort."""
    import re

    df = _scored(spark)
    plan = (
        select_token_budget(
            df,
            order_col=[F.col("q").desc(), F.col("doc_id")],
            size_col="n_tokens",
            budget_frac=(1, 2),
            num_partitions=8,
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for m in re.finditer(r"Window \[(.*?)\]", plan):
        spec = m.group(1)
        assert "__pid" in spec, f"unpartitioned window in plan: {spec}"
