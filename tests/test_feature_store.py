"""Point-in-time joins: no future leakage, multi-table composition,
staleness audit column, prefix collision safety."""

import pytest

from accounting_etl_spark.operators.feature_store import (
    FeatureTable,
    point_in_time_join,
)


def test_future_features_never_leak(spark):
    labels = spark.createDataFrame(
        [(1, 100, "pos"), (1, 50, "neg"), (2, 10, "pos")],
        ["ent", "lt", "y"],
    )
    feat = spark.createDataFrame(
        # entity 1: values at t=40, 100, 150 (150 is the future for
        # both labels; t=100 ties the first label exactly -> included)
        [(1, 40, 4.0), (1, 100, 5.0), (1, 150, 99.0), (2, 20, 7.0)],
        ["ent", "ft", "score"],
    )
    out = point_in_time_join(
        labels,
        [FeatureTable(feat, time_col="ft", payload=["score"])],
        on="ent",
        label_time="lt",
    )
    got = {(r.ent, r.lt): (r.score, r.asof_time) for r in out.collect()}
    assert got == {
        (1, 100): (5.0, 100),  # exact tie: knowable at label time
        (1, 50): (4.0, 40),
        (2, 10): (None, None),  # entity 2's feature arrives later
    }


def test_multiple_tables_with_prefixes(spark):
    labels = spark.createDataFrame([(1, 100)], ["ent", "lt"])
    fa = spark.createDataFrame([(1, 90, 11)], ["ent", "ft", "v"])
    fb = spark.createDataFrame([(1, 80, 22)], ["ent", "ft", "v"])
    out = point_in_time_join(
        labels,
        [
            FeatureTable(fa, time_col="ft", payload=["v"], prefix="a_"),
            FeatureTable(fb, time_col="ft", payload=["v"], prefix="b_"),
        ],
        on="ent",
        label_time="lt",
    ).collect()[0]
    assert (out.a_v, out.a_asof_time) == (11, 90)
    assert (out.b_v, out.b_asof_time) == (22, 80)


def test_same_timestamp_tiebreak(spark):
    labels = spark.createDataFrame([(1, 100)], ["ent", "lt"])
    feat = spark.createDataFrame(
        [(1, 90, 3), (1, 90, 8)], ["ent", "ft", "v"]
    )
    out = point_in_time_join(
        labels,
        [FeatureTable(feat, time_col="ft", payload=["v"], tiebreak=["v"])],
        on="ent",
        label_time="lt",
    ).collect()[0]
    assert out.v == 8  # max tiebreak wins deterministically


def test_validation(spark):
    labels = spark.createDataFrame([(1, 100)], ["ent", "lt"])
    feat = spark.createDataFrame([(1, 90, 3)], ["ent", "ft", "v"])
    with pytest.raises(ValueError):
        point_in_time_join(labels, [], on="ent", label_time="lt")
    with pytest.raises(ValueError):
        FeatureTable(feat, time_col="ft", payload=[])
    with pytest.raises(ValueError):
        FeatureTable(feat, time_col="ft", payload=["v"], tiebreak=["x"])


def test_max_staleness_ttl(spark):
    from accounting_etl_spark.operators.feature_store import (
        FeatureTable,
        point_in_time_join,
    )

    labels = spark.createDataFrame(
        [(1, 100), (1, 500)], "user_id int, t bigint"
    )
    bal = spark.createDataFrame(
        [(1, 90, 42.0)], "user_id int, ft bigint, balance double"
    )
    out = point_in_time_join(
        labels,
        [
            FeatureTable(
                bal, time_col="ft", payload=["balance"],
                prefix="b_", max_staleness=50,
            )
        ],
        on="user_id",
        label_time="t",
    ).collect()
    got = {r["t"]: (r["b_balance"], r["b_asof_time"]) for r in out}
    # t=100: feature 10 old -> served with its asof audit time;
    # t=500: the only feature row is 410 stale -> treated as absent
    assert got == {100: (42.0, 90), 500: (None, None)}
