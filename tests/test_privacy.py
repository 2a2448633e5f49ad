"""k-anonymity / l-diversity audit (operators/privacy.py):
hand-computed class sizes, the two risk conditions independently,
no-sensitive mode, parameter validation, and a plan check that the
audit is one aggregation over the raw rows (no join/window)."""

import pytest
from pyspark.sql import functions as F

from accounting_etl_spark.operators.privacy import k_anonymity_audit


def _rows(spark):
    # quasi = (region, band); sensitive = tier
    data = [
        # class (east, 0): 3 records, 2 distinct tiers
        ("east", 0, "a"), ("east", 0, "a"), ("east", 0, "b"),
        # class (east, 1): 1 record -> size-risky
        ("east", 1, "a"),
        # class (west, 0): 2 records but ONE tier -> diversity-risky
        ("west", 0, "c"), ("west", 0, "c"),
    ]
    return spark.createDataFrame(data, ["region", "band", "tier"])


def _audit_map(df):
    return {
        (r["q0"], r["q1"]): (r["class_size"], r["n_sensitive"], r["is_risky"])
        for r in df.collect()
    }


def test_hand_computed_classes(spark):
    out = k_anonymity_audit(
        _rows(spark), ["region", "band"], k=2,
        sensitive="tier", l_threshold=2,
    )
    got = _audit_map(out)
    assert got == {
        ("east", 0): (3, 2, False),
        ("east", 1): (1, 1, True),   # below k
        ("west", 0): (2, 1, True),   # below l
    }


def test_k_only_mode_ignores_diversity(spark):
    out = k_anonymity_audit(_rows(spark), ["region", "band"], k=2)
    got = _audit_map(out)
    assert got[("west", 0)] == (2, 0, False)
    assert got[("east", 1)][2] is True


def test_column_expressions_as_quasi(spark):
    # banding through an expression, as the release pipeline would
    df = spark.createDataFrame(
        [(i, i * 100.0, "t%d" % (i % 2)) for i in range(10)],
        ["id", "bal", "tier"],
    )
    out = k_anonymity_audit(
        df,
        [F.floor(F.col("bal") / 500).cast("bigint")],
        k=5,
        sensitive="tier",
        l_threshold=2,
    )
    got = {r["q0"]: (r["class_size"], r["is_risky"]) for r in out.collect()}
    assert got == {0: (5, False), 1: (5, False)}


def test_bad_params_raise(spark):
    df = _rows(spark)
    with pytest.raises(ValueError):
        k_anonymity_audit(df, [], k=2)
    with pytest.raises(ValueError):
        k_anonymity_audit(df, ["region"], k=0)


def test_single_aggregation_plan(spark):
    """The audit must stay ONE shuffle over the raw rows: no Join or
    Window may appear in the optimized plan (the countDistinct
    expands to a two-phase aggregate, which is fine)."""
    out = k_anonymity_audit(
        _rows(spark), ["region", "band"], k=2,
        sensitive="tier", l_threshold=2,
    )
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan and "Window" not in plan
