"""Linear gap interpolation: hand-computed fills, floor semantics,
edge NULLs, per-key independence, observed passthrough."""

from accounting_etl_spark.operators.interpolate import linear_fill


def _fill(spark, rows, keys=("k",)):
    df = spark.createDataFrame(rows, [*keys, "x", "y"])
    out = linear_fill(df, list(keys), "x", "y")
    return {
        tuple([*(r[k] for k in keys), r.x]): r.filled
        for r in out.collect()
    }


def test_hand_computed_fill_and_floor(spark):
    rows = [
        ("a", 0, 100),
        ("a", 1, None),
        ("a", 2, None),
        ("a", 3, 110),  # slope 10/3: floors to 103, 106
        ("a", 4, 7),
    ]
    got = _fill(spark, rows)
    assert got == {
        ("a", 0): 100,
        ("a", 1): 103,  # (100*2 + 110*1) div 3
        ("a", 2): 106,  # (100*1 + 110*2) div 3
        ("a", 3): 110,
        ("a", 4): 7,
    }


def test_outside_observed_range_stays_null(spark):
    rows = [("a", 0, None), ("a", 1, 5), ("a", 2, None), ("a", 3, 9),
            ("a", 4, None)]
    got = _fill(spark, rows)
    assert got[("a", 0)] is None and got[("a", 4)] is None
    assert got[("a", 2)] == 7


def test_keys_do_not_leak(spark):
    rows = [("a", 0, 10), ("a", 2, 20), ("b", 1, 500)]
    got = _fill(spark, rows)
    # 'a' interpolates from its own series only; 'b' has one point
    assert got == {("a", 0): 10, ("a", 2): 20, ("b", 1): 500}
    rows2 = [("a", 0, 10), ("a", 1, None), ("a", 2, 20),
             ("b", 0, 500), ("b", 1, None)]
    got2 = _fill(spark, rows2)
    assert got2[("a", 1)] == 15
    assert got2[("b", 1)] is None  # no next observation for b


def test_irregular_spacing(spark):
    rows = [("a", 10, 0), ("a", 14, None), ("a", 20, 1000)]
    got = _fill(spark, rows)
    assert got[("a", 14)] == (0 * 6 + 1000 * 4) // 10
