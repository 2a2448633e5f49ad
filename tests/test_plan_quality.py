"""Plan-quality regression guards (SURVEY §4, COVERAGE scale posture):
pushdown, pruning, broadcast selection, and JVM-only hot paths,
asserted on the physical plans so a refactor can't silently lose them.
"""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_flagship_pushdown_pruning_broadcast(spark):
    from accounting_etl_spark.queries.relational import q_flagship_revenue

    plan = _plan(q_flagship_revenue(spark, SF_SMOKE))
    # shipdate filter reaches the parquet scan
    assert "PushedFilters" in plan and "l_shipdate" in plan
    # column pruning: the lineitem scan must not read unused measures
    assert "l_tax" not in plan.split("PushedFilters")[0] or "l_tax" not in plan
    # all four dims broadcast at this size
    assert plan.count("BroadcastHashJoin") >= 4
    # no Python evaluation anywhere in the hot path
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_statement_parse_stays_in_jvm(spark):
    """After the one clustering UDF, the entire row parse is native —
    exactly one Arrow-Python boundary in the whole plan (U2 decomposed
    per SURVEY §2.10)."""
    from accounting_etl_spark.plans import fixtures as FX
    from accounting_etl_spark.plans.statement import extract_transactions

    plan = _plan(extract_transactions(FX.words_df(spark)))
    assert plan.count("FlatMapGroupsInPandas") == 1
    assert "BatchEvalPython" not in plan


def test_two_tier_lookup_broadcasts_dim(spark):
    from accounting_etl_spark.queries.relational import q_two_tier_lookup

    plan = _plan(q_two_tier_lookup(spark, SF_SMOKE))
    # tier 1 broadcast hash join + tier 2 broadcast nested loop
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" in plan
    # no sort-merge join: nothing shuffles the fact side for lookup
    assert "SortMergeJoin" not in plan


def test_dedup_exact_single_shuffle(spark):
    from accounting_etl_spark.queries.text import q_dedup_exact

    plan = _plan(q_dedup_exact(spark, SF_SMOKE))
    # hash-groupBy dedup: exactly one exchange (plus AQE reads)
    assert plan.count("Exchange hashpartitioning") == 1
