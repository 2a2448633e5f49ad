"""asof_join unit tests — the NULL-payload atomicity case the oracle
gate can't catch (reference queries pass non-null payloads)."""

from __future__ import annotations

from accounting_etl_spark.operators.asof import asof_join


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_asof_struct_carry_is_atomic(spark):
    """A right row with a NULL payload column must not be back-filled
    from an older right row: all payload fields come from the single
    matched row (row_number ORDER BY time DESC, tiebreak DESC = 1)."""
    left = spark.createDataFrame(
        [(1, 100, "e1"), (1, 200, "e2")], "k int, t bigint, ev string"
    )
    right = spark.createDataFrame(
        [(1, 50, "old", 10), (1, 150, None, 20)],
        "k int, t bigint, a string, b int",
    )
    out = asof_join(
        left.select("k", "t", "ev"),
        right,
        on="k",
        left_time="t",
        right_time="t",
        payload=["a", "b"],
        tiebreak=["b"],
    )
    got = {r["ev"]: (r["a"], r["b"]) for r in out.collect()}
    assert got["e1"] == ("old", 10)
    # e2's match is the t=150 row: a must stay NULL (not 'old' carried
    # from t=50 while b comes from t=150)
    assert got["e2"] == (None, 20)


def test_asof_no_match_and_ties(spark):
    left = spark.createDataFrame([(1, 10), (2, 500)], "k int, t bigint")
    right = spark.createDataFrame(
        [(2, 500, "x", 1), (2, 500, "y", 2)], "k int, t bigint, a string, b int"
    )
    out = asof_join(
        left,
        right,
        on="k",
        left_time="t",
        right_time="t",
        payload=["a", "b"],
        tiebreak=["b"],
    )
    got = {r["k"]: (r["a"], r["b"]) for r in out.collect()}
    assert got[1] == (None, None)  # no right row at/before t=10
    assert got[2] == ("y", 2)  # equal-time tie: max tiebreak wins


def test_asof_nearest_picks_closer_side(spark):
    left = spark.createDataFrame(
        [(1, 100, "e1"), (1, 210, "e2"), (2, 50, "e3")],
        "k int, t bigint, ev string",
    )
    right = spark.createDataFrame(
        [(1, 90, "b", 1), (1, 205, "f", 2), (2, 300, "far", 3)],
        "k int, t bigint, a string, b int",
    )
    out = asof_join(
        left.select("k", "t", "ev"),
        right,
        on="k",
        left_time="t",
        right_time="t",
        payload=["a", "b"],
        tiebreak=["b"],
        direction="nearest",
    )
    got = {r["ev"]: r["a"] for r in out.collect()}
    assert got["e1"] == "b"  # |100-90|=10 < |205-100|=105
    assert got["e2"] == "f"  # |210-205|=5 < |210-90|=120
    assert got["e3"] == "far"  # forward-only match (no backward row)


def test_asof_nearest_tie_prefers_backward(spark):
    left = spark.createDataFrame([(1, 100)], "k int, t bigint")
    right = spark.createDataFrame(
        [(1, 90, "back", 1), (1, 110, "fwd", 2)], "k int, t bigint, a string, b int"
    )
    out = asof_join(
        left,
        right,
        on="k",
        left_time="t",
        right_time="t",
        payload=["a", "b"],
        tiebreak=["b"],
        direction="nearest",
    )
    assert out.collect()[0]["a"] == "back"


def test_asof_tolerance_backward(spark):
    from accounting_etl_spark.operators.asof import asof_join
    import pytest

    left = spark.createDataFrame(
        [(1, 100), (1, 200), (2, 100)], "k int, t bigint"
    )
    right = spark.createDataFrame(
        [(1, 95, "fresh"), (1, 50, "stale"), (2, 10, "old")],
        "k int, t bigint, a string",
    )
    out = asof_join(
        left, right, on="k", left_time="t", right_time="t",
        payload=["a"], tolerance=10,
    )
    got = {(r["k"], r["t"]): r["a"] for r in out.collect()}
    # t=100 matches 95 (dist 5 <= 10); t=200's best match 95 is 105
    # away -> NULL but the row survives; k=2's only match is 90 away
    assert got == {(1, 100): "fresh", (1, 200): None, (2, 100): None}
    with pytest.raises(ValueError):
        asof_join(left, right, on="k", left_time="t", right_time="t",
                  payload=["a"], tolerance=-1)


def test_asof_tolerance_nearest(spark):
    from accounting_etl_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 100), (1, 300)], "k int, t bigint")
    right = spark.createDataFrame(
        [(1, 94, "b"), (1, 103, "f")], "k int, t bigint, a string"
    )
    out = asof_join(
        left, right, on="k", left_time="t", right_time="t",
        payload=["a"], direction="nearest", tolerance=5,
    )
    got = {r["t"]: r["a"] for r in out.collect()}
    # t=100: nearest is 103 (dist 3 <= 5); t=300: nearest 103 is 197
    # away -> NULL payload
    assert got == {100: "f", 300: None}
