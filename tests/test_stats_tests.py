"""Chi-square independence: textbook 2x2 reference, perfect
independence, zero-margin cells, category filtering."""

import pytest

from accounting_etl_spark.operators.stats_tests import (
    chi_square_independence,
    contingency_counts,
)


def _rows(counts):
    # counts[(r, c)] = n -> expand to rows
    out = []
    for (r, c), n in counts.items():
        out += [(r, c)] * n
    return out


def test_textbook_two_by_two(spark):
    # classic 2x2: o = [[10, 20], [30, 40]]
    df = spark.createDataFrame(
        _rows({("a", 0): 10, ("a", 1): 20, ("b", 0): 30, ("b", 1): 40}),
        ["r", "c"],
    )
    out = chi_square_independence(df, "r", "c", ("a", "b"), (0, 1)).collect()[0]
    n = 100
    e = {  # expected counts from margins (30, 70) x (40, 60)
        ("a", 0): 30 * 40 / 100,
        ("a", 1): 30 * 60 / 100,
        ("b", 0): 70 * 40 / 100,
        ("b", 1): 70 * 60 / 100,
    }
    o = {("a", 0): 10, ("a", 1): 20, ("b", 0): 30, ("b", 1): 40}
    want = sum((o[k] - e[k]) ** 2 / e[k] for k in sorted(o))
    assert out.n == n and out.dof == 1
    assert out.chi2 == pytest.approx(want, rel=1e-12)
    assert out.cramers_v == pytest.approx((want / n) ** 0.5, rel=1e-12)


def test_perfect_independence_is_zero(spark):
    df = spark.createDataFrame(
        _rows({("a", 0): 12, ("a", 1): 24, ("b", 0): 6, ("b", 1): 12}),
        ["r", "c"],
    )
    out = chi_square_independence(df, "r", "c", ("a", "b"), (0, 1)).collect()[0]
    assert out.chi2 == pytest.approx(0.0, abs=1e-12)


def test_zero_margin_contributes_nothing(spark):
    # category 'c' enumerated but absent: its row margin is 0, its
    # cells must contribute 0 rather than dividing by zero
    df = spark.createDataFrame(
        _rows({("a", 0): 5, ("a", 1): 5, ("b", 0): 5, ("b", 1): 5}),
        ["r", "c"],
    )
    out = chi_square_independence(
        df, "r", "c", ("a", "b", "c"), (0, 1)
    ).collect()[0]
    assert out.n == 20
    assert out.chi2 == pytest.approx(0.0, abs=1e-12)
    assert out.dof == 2


def test_unenumerated_values_ignored(spark):
    df = spark.createDataFrame(
        _rows({("a", 0): 3, ("zzz", 0): 99}), ["r", "c"]
    )
    cc = contingency_counts(df, "r", "c", ("a",), (0,)).collect()[0]
    assert cc.o_0_0 == 3


def test_empty_categories_rejected(spark):
    df = spark.createDataFrame([("a", 0)], ["r", "c"])
    with pytest.raises(ValueError):
        chi_square_independence(df, "r", "c", (), (0,))
