"""Contract audit: planted violations, one-pass rule folding, null
semantics, uniqueness surplus counting, FK orphan exclusion of NULL
keys."""

import pytest
from pyspark.sql import functions as F

from accounting_etl_spark.operators.contracts import (
    audit_fk,
    audit_rules,
    audit_union,
    audit_unique,
)


def _report(df):
    return {r.check: (r.violations, r.checked) for r in df.collect()}


def test_rules_fold_in_one_pass_with_planted_violations(spark):
    rows = [(1, 10.0, "A"), (2, -3.0, "A"), (3, 999.0, "X"), (4, None, "B")]
    df = spark.createDataFrame(rows, ["id", "amount", "flag"])
    rep = _report(
        audit_rules(
            df,
            [
                ("amount_range", ~F.col("amount").between(0, 100)),
                ("flag_domain", ~F.col("flag").isin("A", "B")),
                ("amount_not_null", F.col("amount").isNull()),
            ],
        )
    )
    # NULL amount makes the range predicate NULL -> non-violating;
    # the explicit not-null rule is what catches it
    assert rep == {
        "amount_range": (2, 4),
        "flag_domain": (1, 4),
        "amount_not_null": (1, 4),
    }
    # rules fold into ONE aggregate: a single scan of the input
    plan = audit_rules(
        df, [("a", F.col("amount") < 0), ("b", F.col("amount") > 100)]
    )._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LogicalRDD") == 1


def test_unique_counts_surplus_rows_only(spark):
    df = spark.createDataFrame(
        [(1, 1), (1, 1), (1, 1), (2, 1), (3, 2)], ["k1", "k2"]
    )
    rep = _report(audit_unique(df, ["k1", "k2"], "pk"))
    assert rep == {"pk": (2, 5)}  # the (1,1) group has 2 extras
    clean = spark.createDataFrame([(1,), (2,)], ["k1"])
    assert _report(audit_unique(clean, ["k1"], "pk")) == {"pk": (0, 2)}


def test_fk_orphans_exclude_null_child_keys(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 99), (4, None)], ["id", "ref"]
    )
    parent = spark.createDataFrame([(10,), (20,)], ["pid"])
    rep = _report(audit_fk(child, "ref", parent, "pid", "child.fk"))
    # 99 is the one orphan; the NULL key is not checked at all
    assert rep == {"child.fk": (1, 3)}


def test_union_combines_fragments(spark):
    df = spark.createDataFrame([(1,), (1,)], ["k"])
    rep = _report(
        audit_union(
            [
                audit_unique(df, ["k"], "pk"),
                audit_rules(df, [("k_positive", F.col("k") <= 0)]),
            ]
        )
    )
    assert rep == {"pk": (1, 2), "k_positive": (0, 2)}


def test_empty_rules_rejected(spark):
    df = spark.createDataFrame([(1,)], ["k"])
    with pytest.raises(ValueError):
        audit_rules(df, [])
    with pytest.raises(ValueError):
        audit_union([])


def test_empty_table_reports_zero_over_zero_groups(spark):
    df = spark.createDataFrame([], "k int, v double")
    rep = _report(audit_rules(df, [("v_pos", F.col("v") <= 0)]))
    assert rep == {"v_pos": (0, 0)}
    rep = _report(audit_unique(df, ["k"], "pk"))
    assert rep == {"pk": (0, 0)}
