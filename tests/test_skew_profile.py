"""Join-fanout profile: exact cardinality prediction, null keys,
both-sides-only keys, plan stays data-size-free."""

from pyspark.sql import functions as F

from accounting_etl_spark.operators.skew import join_fanout_profile


def test_fanout_predicts_exact_join_cardinality(spark):
    left = spark.createDataFrame(
        [(k, i) for k in ("a", "a", "a", "b", "c") for i in range(2)],
        ["k", "x"],
    )
    right = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3), ("d", 4)], ["k", "y"]
    )
    prof = {
        r.key: (r.n_left, r.n_right, r.fanout)
        for r in join_fanout_profile(left, right, "k").collect()
    }
    # keys on both sides only; 'c' (left-only) and 'd' (right-only)
    # produce no join output and no profile row
    assert prof == {"a": (6, 2, 12), "b": (2, 1, 2)}
    predicted = sum(f for _, _, f in prof.values())
    actual = left.join(right, "k").count()
    assert predicted == actual == 14


def test_null_keys_excluded_like_the_join_excludes_them(spark):
    left = spark.createDataFrame([("a", 1), (None, 2)], ["k", "x"])
    right = spark.createDataFrame([("a", 1), (None, 2)], ["k", "y"])
    prof = join_fanout_profile(left, right, "k").collect()
    assert [(r.key, r.fanout) for r in prof] == [("a", 1)]
    assert left.join(right, "k").count() == 1


def test_distinct_key_names_per_side(spark):
    left = spark.createDataFrame([("a", 1)], ["lk", "x"])
    right = spark.createDataFrame([("a", 1), ("a", 2)], ["rk", "y"])
    r = join_fanout_profile(left, right, "lk", "rk").collect()[0]
    assert (r.key, r.n_left, r.n_right, r.fanout) == ("a", 1, 2, 2)


def test_profile_plan_never_joins_the_data_tables(spark):
    # the profile joins two COUNT aggregates: each input appears once,
    # under an Aggregate — never as a raw join input
    left = spark.createDataFrame([("a", 1)], ["k", "x"])
    right = spark.createDataFrame([("a", 1)], ["k", "y"])
    plan = (
        join_fanout_profile(left, right, "k")
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert plan.count("LogicalRDD") == 2
    assert plan.count("Aggregate") >= 2
