"""Incremental view maintenance: delta path equals recomputation
under random insert/delete batches; bag algebra invariants."""

import random

from pyspark.sql import functions as F

from accounting_etl_spark.operators.ivm import (
    MULT,
    apply_delta,
    as_bag,
    bag_union,
    join_view_delta,
)


def _bag_dict(df):
    cols = [c for c in df.columns if c != MULT]
    return {
        tuple(r[c] for c in cols): r[MULT] for r in df.collect()
    }


def test_as_bag_counts_duplicates(spark):
    df = spark.createDataFrame([(1, "x"), (1, "x"), (2, "y")], ["k", "v"])
    assert _bag_dict(as_bag(df)) == {(1, "x"): 2, (2, "y"): 1}
    assert _bag_dict(as_bag(df, -1)) == {(1, "x"): -2, (2, "y"): -1}


def test_bag_union_cancels_to_zero(spark):
    a = spark.createDataFrame([(1, "x")], ["k", "v"])
    assert _bag_dict(bag_union(as_bag(a), as_bag(a, -1))) == {}
    assert _bag_dict(bag_union(as_bag(a), as_bag(a))) == {(1, "x"): 2}


def test_delta_path_equals_recompute_random_batches(spark):
    rng = random.Random(17)
    a_rows = [(rng.randrange(8), f"a{i}") for i in range(40)]
    b_rows = [(rng.randrange(8), f"b{i}") for i in range(20)]
    a_old_rows = a_rows[:25]
    b_old_rows = b_rows[:14]
    a_ins = a_rows[25:]
    a_del = [r for r in a_old_rows if rng.random() < 0.3]
    b_ins = b_rows[14:]
    b_del = [r for r in b_old_rows if rng.random() < 0.3]

    mk = lambda rows, cols: spark.createDataFrame(rows, cols)  # noqa: E731
    a_old = mk(a_old_rows, ["k", "av"])
    b_old = mk(b_old_rows, ["k", "bv"])
    da = bag_union(
        as_bag(mk(a_ins, ["k", "av"])), as_bag(mk(a_del, ["k", "av"]), -1)
    )
    db = bag_union(
        as_bag(mk(b_ins, ["k", "bv"])), as_bag(mk(b_del, ["k", "bv"]), -1)
    )
    view_old = as_bag(a_old.join(b_old, "k"))
    maintained = apply_delta(
        view_old, join_view_delta(as_bag(a_old), da, as_bag(b_old), db, "k")
    )

    a_final = [r for r in a_old_rows if r not in a_del] + a_ins
    b_final = [r for r in b_old_rows if r not in b_del] + b_ins
    recomputed = as_bag(
        mk(a_final, ["k", "av"]).join(mk(b_final, ["k", "bv"]), "k")
    )
    assert _bag_dict(maintained) == _bag_dict(recomputed)


def test_empty_deltas_leave_view_unchanged(spark):
    a = spark.createDataFrame([(1, "x"), (2, "y")], ["k", "av"])
    b = spark.createDataFrame([(1, "p")], ["k", "bv"])
    empty_a = as_bag(a).where(F.lit(False))
    empty_b = as_bag(b).where(F.lit(False))
    view = as_bag(a.join(b, "k"))
    delta = join_view_delta(as_bag(a), empty_a, as_bag(b), empty_b, "k")
    assert _bag_dict(delta) == {}
    assert _bag_dict(apply_delta(view, delta)) == _bag_dict(view)


def test_update_as_delete_plus_insert(spark):
    a = spark.createDataFrame([(1, "old")], ["k", "av"])
    b = spark.createDataFrame([(1, "p")], ["k", "bv"])
    da = bag_union(
        as_bag(spark.createDataFrame([(1, "old")], ["k", "av"]), -1),
        as_bag(spark.createDataFrame([(1, "new")], ["k", "av"])),
    )
    db = as_bag(b).where(F.lit(False))
    view = apply_delta(
        as_bag(a.join(b, "k")),
        join_view_delta(as_bag(a), da, as_bag(b), db, "k"),
    )
    assert _bag_dict(view) == {(1, "new", "p"): 1}


def test_non_bag_inputs_rejected(spark):
    a = spark.createDataFrame([(1, "x")], ["k", "av"])
    b = spark.createDataFrame([(1, "p")], ["k", "bv"])
    try:
        join_view_delta(a, as_bag(a), as_bag(b), as_bag(b), "k")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
