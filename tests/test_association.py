"""Association rules: hand-computed support/confidence/lift,
direction asymmetry, min-support pruning, within-basket dedup."""

import pytest

from accounting_etl_spark.operators.association import association_rules


def _rules(spark, rows, **kw):
    df = spark.createDataFrame(rows, ["b", "i"])
    out = association_rules(df, "b", "i", **kw)
    return {
        (r.antecedent, r.consequent): (
            r.c_xy,
            r.c_x,
            r.c_y,
            r.conf_milli,
            r.lift_scaled,
        )
        for r in out.collect()
    }


def test_hand_computed_measures(spark):
    # 4 baskets; x in 3, y in 2, {x,y} together in 2
    rows = [
        (1, "x"), (1, "y"),
        (2, "x"), (2, "y"),
        (3, "x"),
        (4, "z"),
    ]
    got = _rules(spark, rows, scale=100)
    # conf(x->y) = 2/3 -> 666; conf(y->x) = 2/2 -> 1000
    # lift = 2*4/(3*2) = 4/3 -> 133 at scale 100 (floor)
    assert got == {
        ("x", "y"): (2, 3, 2, 666, 133),
        ("y", "x"): (2, 2, 3, 1000, 133),
    }


def test_min_support_prunes(spark):
    rows = [(1, "x"), (1, "y"), (2, "p"), (2, "q"), (3, "x"), (3, "y")]
    got2 = _rules(spark, rows, min_support=2)
    assert set(got2) == {("x", "y"), ("y", "x")}
    got1 = _rules(spark, rows, min_support=1)
    assert ("p", "q") in got1 and ("q", "p") in got1
    with pytest.raises(ValueError):
        _rules(spark, rows, min_support=0)


def test_within_basket_duplicates_count_once(spark):
    rows = [(1, "x"), (1, "x"), (1, "y"), (2, "x"), (2, "y")]
    got = _rules(spark, rows, min_support=2)
    # c_x = 2 baskets (not 3 rows)
    assert got[("x", "y")][:3] == (2, 2, 2)


def test_independent_items_have_lift_scale(spark):
    # y in every basket: lift(x->y) = c_xy*nb/(c_x*c_y) = 1 exactly
    rows = [(b, "y") for b in range(4)] + [(0, "x"), (1, "x")]
    got = _rules(spark, rows, min_support=2, scale=1000)
    assert got[("x", "y")][4] == 1000
