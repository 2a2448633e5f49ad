"""Multi-touch attribution: model semantics, credit conservation,
lookback boundaries, tie-breaks, model subsetting."""

import pytest

from accounting_etl_spark.operators.attribution import (
    attribute_conversions,
)


def _run(spark, convs, touches, lookback=100, models=None):
    c = spark.createDataFrame(convs, ["u", "cid", "ct", "val"])
    t = spark.createDataFrame(touches, ["u", "tid", "tt"])
    kw = {} if models is None else {"models": models}
    return attribute_conversions(
        c,
        t,
        on="u",
        conv_id="cid",
        conv_time="ct",
        value="val",
        touch_id="tid",
        touch_time="tt",
        lookback=lookback,
        **kw,
    ).collect()


def test_models_and_credit_conservation(spark):
    convs = [("u1", 100, 50, 1000)]
    touches = [("u1", 1, 10), ("u1", 2, 20), ("u1", 3, 30)]
    rows = _run(spark, convs, touches)
    got = {(r.model, r.touch_id): r.credit for r in rows}
    # first/last assign full value; linear splits 1000 over 3 with
    # the remainder (1) on the last touch
    assert got == {
        ("first", 1): 1000,
        ("last", 3): 1000,
        ("linear", 1): 333,
        ("linear", 2): 333,
        ("linear", 3): 334,
    }
    lin = sum(c for (m, _), c in got.items() if m == "linear")
    assert lin == 1000


def test_lookback_window_is_half_open(spark):
    convs = [("u1", 100, 50, 600)]
    # tt must satisfy: tt > ct - lookback AND tt <= ct
    touches = [
        ("u1", 1, 10),  # == ct - lookback (40 exclusive boundary): out
        ("u1", 2, 11),  # just inside
        ("u1", 3, 50),  # == ct: inclusive
        ("u1", 4, 51),  # after conversion: out
    ]
    rows = _run(spark, convs, touches, lookback=40)
    assert {r.touch_id for r in rows} == {2, 3}
    got = {(r.model, r.touch_id): r.credit for r in rows}
    assert got[("first", 2)] == 600 and got[("last", 3)] == 600


def test_cross_user_touches_never_attributed(spark):
    convs = [("u1", 100, 50, 10)]
    touches = [("u2", 9, 50)]
    assert _run(spark, convs, touches) == []


def test_time_ties_break_by_touch_id(spark):
    convs = [("u1", 100, 50, 10)]
    touches = [("u1", 7, 30), ("u1", 3, 30)]
    got = {
        (r.model, r.touch_id): r.credit
        for r in _run(spark, convs, touches)
    }
    assert got[("first", 3)] == 10  # lower id wins the asc tie
    assert got[("last", 7)] == 10  # higher id wins the desc tie


def test_single_touch_gets_everything_everywhere(spark):
    convs = [("u1", 100, 50, 999)]
    touches = [("u1", 1, 49)]
    got = {(r.model,): r.credit for r in _run(spark, convs, touches)}
    assert got == {("first",): 999, ("last",): 999, ("linear",): 999}


def test_model_subset_and_validation(spark):
    convs = [("u1", 100, 50, 10)]
    touches = [("u1", 1, 49), ("u1", 2, 50)]
    rows = _run(spark, convs, touches, models=("last",))
    assert [(r.model, r.touch_id) for r in rows] == [("last", 2)]
    with pytest.raises(ValueError):
        _run(spark, convs, touches, models=("bogus",))
    with pytest.raises(ValueError):
        _run(spark, convs, touches, models=())
