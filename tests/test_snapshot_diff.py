"""Snapshot diff (operators/diff.py): keyed added/removed/changed
classification with null-safe column compare."""

from __future__ import annotations

from pyspark.sql import functions as F


def _dfs(spark):
    old = spark.createDataFrame(
        [
            ("a", 1, "x"),
            ("b", 2, None),
            ("c", 3, "z"),
            ("d", 4, "w"),
        ],
        "k string, n int, s string",
    )
    new = spark.createDataFrame(
        [
            ("a", 1, "x"),       # unchanged
            ("b", 2, "filled"),  # changed: s NULL -> value
            ("c", 9, None),      # changed: n and s
            ("e", 5, "new"),     # added
        ],                        # d removed
        "k string, n int, s string",
    )
    return old, new


def test_classification_and_payload(spark):
    from accounting_etl_spark.operators.diff import snapshot_diff

    old, new = _dfs(spark)
    got = {
        r["k"]: (r["change"], r["n"], r["s"], list(r["changed_cols"]))
        for r in snapshot_diff(old, new, "k").collect()
    }
    assert got == {
        "b": ("changed", 2, "filled", ["s"]),
        "c": ("changed", 9, None, ["n", "s"]),
        "d": ("removed", 4, "w", []),   # removed carries the OLD row
        "e": ("added", 5, "new", []),
    }


def test_include_unchanged_and_subset_cols(spark):
    from accounting_etl_spark.operators.diff import snapshot_diff

    old, new = _dfs(spark)
    # comparing only n: b becomes unchanged, c changed on n alone
    rows = {
        r["k"]: r["change"]
        for r in snapshot_diff(
            old, new, "k", compare_cols=["n"], include_unchanged=True
        ).collect()
    }
    assert rows == {
        "a": "unchanged",
        "b": "unchanged",
        "c": "changed",
        "d": "removed",
        "e": "added",
    }


def test_single_shuffle_plan(spark):
    from accounting_etl_spark.operators.diff import snapshot_diff

    old, new = _dfs(spark)
    plan = (
        snapshot_diff(old, new, "k")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one co-partitioned SMJ: exactly two exchanges (one per side),
    # no broadcast of either snapshot, no nested loop
    assert plan.count("Exchange hashpartitioning") == 2
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
