"""Continuously maintained join view: multi-epoch maintenance equals
recomputation, replay idempotence, touched-bucket-only writes,
streaming wiring."""

import os

from pyspark.sql import functions as F

from accounting_etl_spark.operators.ivm import MULT, as_bag, bag_union
from accounting_etl_spark.streaming.ivm_stream import (
    merge_join_view_epoch,
    read_join_view,
    stream_join_view,
)


def _bag_dict(df):
    cols = [c for c in df.columns if c != MULT]
    return {tuple(r[c] for c in cols): r[MULT] for r in df.collect()}


def _empty_like(bag):
    return bag.where(F.lit(False))


def test_two_epochs_equal_recompute(spark, tmp_path):
    state = str(tmp_path / "state")
    a0 = spark.createDataFrame(
        [(1, "a1"), (2, "a2"), (2, "a2b")], ["k", "av"]
    )
    b0 = spark.createDataFrame([(1, "b1"), (2, "b2")], ["k", "bv"])
    assert merge_join_view_epoch(
        state, as_bag(a0), as_bag(b0), on="k", epoch_id=0, n_buckets=4
    )
    # epoch 1: insert a new A row for key 3 and a B row for it,
    # delete one A row of key 2
    da = bag_union(
        as_bag(spark.createDataFrame([(3, "a3")], ["k", "av"])),
        as_bag(spark.createDataFrame([(2, "a2b")], ["k", "av"]), -1),
    )
    db = as_bag(spark.createDataFrame([(3, "b3")], ["k", "bv"]))
    assert merge_join_view_epoch(
        state, da, db, on="k", epoch_id=1, n_buckets=4
    )
    got = _bag_dict(read_join_view(spark, state))
    a_final = spark.createDataFrame(
        [(1, "a1"), (2, "a2"), (3, "a3")], ["k", "av"]
    )
    b_final = spark.createDataFrame(
        [(1, "b1"), (2, "b2"), (3, "b3")], ["k", "bv"]
    )
    want = _bag_dict(as_bag(a_final.join(b_final, "k")))
    assert got == want


def test_committed_replay_returns_early_and_preserves_state(
    spark, tmp_path
):
    state = str(tmp_path / "state")
    a = spark.createDataFrame([(1, "a1")], ["k", "av"])
    b = spark.createDataFrame([(1, "b1")], ["k", "bv"])
    assert merge_join_view_epoch(
        state, as_bag(a), as_bag(b), on="k", epoch_id=0
    )
    before = _bag_dict(read_join_view(spark, state))
    # a replay of the SAME epoch (even with different data) is a no-op
    bogus = as_bag(spark.createDataFrame([(9, "x")], ["k", "av"]))
    assert not merge_join_view_epoch(
        state, bogus, _empty_like(as_bag(b)), on="k", epoch_id=0
    )
    assert _bag_dict(read_join_view(spark, state)) == before


def test_only_touched_buckets_are_written(spark, tmp_path):
    state = str(tmp_path / "state")
    a = spark.createDataFrame(
        [(i, f"a{i}") for i in range(12)], ["k", "av"]
    )
    b = spark.createDataFrame(
        [(i, f"b{i}") for i in range(12)], ["k", "bv"]
    )
    merge_join_view_epoch(
        state, as_bag(a), as_bag(b), on="k", epoch_id=0, n_buckets=8
    )
    # epoch 1 touches ONE key -> exactly one bucket dir per table
    da = as_bag(spark.createDataFrame([(5, "a5x")], ["k", "av"]))
    db = _empty_like(as_bag(b))
    merge_join_view_epoch(state, da, db, on="k", epoch_id=1, n_buckets=8)
    e1 = os.path.join(state, "epoch=00000001")
    for t in ("a", "b", "v"):
        pbs = [
            d
            for d in os.listdir(os.path.join(e1, t))
            if d.startswith("__pb=")
        ]
        assert len(pbs) == 1, (t, pbs)
    # and the view still equals the recompute
    a_final = a.unionByName(
        spark.createDataFrame([(5, "a5x")], ["k", "av"])
    )
    assert _bag_dict(read_join_view(spark, state)) == _bag_dict(
        as_bag(a_final.join(b, "k"))
    )


def test_empty_epoch_commits_without_writes(spark, tmp_path):
    state = str(tmp_path / "state")
    a = spark.createDataFrame([(1, "a1")], ["k", "av"])
    b = spark.createDataFrame([(1, "b1")], ["k", "bv"])
    merge_join_view_epoch(state, as_bag(a), as_bag(b), on="k", epoch_id=0)
    before = _bag_dict(read_join_view(spark, state))
    assert merge_join_view_epoch(
        state,
        _empty_like(as_bag(a)),
        _empty_like(as_bag(b)),
        on="k",
        epoch_id=1,
    )
    assert not os.path.exists(os.path.join(state, "epoch=00000001"))
    assert _bag_dict(read_join_view(spark, state)) == before


def _bucket_of(spark, k, n):
    return (
        spark.range(1)
        .select(
            F.pmod(
                F.xxhash64(F.lit(k).cast("bigint")), F.lit(n)
            ).cast("string")
        )
        .first()[0]
    )


def test_unmatched_delta_key_across_two_epochs(spark, tmp_path):
    """ADVICE r5 (medium): an epoch whose delta key has NO match on
    the other side writes zero rows for the b/v tables of a fresh
    bucket; the manifest must not point later epochs at those
    fileless directories (was: UNABLE_TO_INFER_SCHEMA)."""
    state = str(tmp_path / "state")
    nb = 64
    a = spark.createDataFrame([(1, "a1")], ["k", "av"])
    b = spark.createDataFrame([(1, "b1")], ["k", "bv"])
    merge_join_view_epoch(
        state, as_bag(a), as_bag(b), on="k", epoch_id=0, n_buckets=nb
    )
    # a key hashing to a bucket B has never touched
    k2 = next(
        k
        for k in range(2, 200)
        if _bucket_of(spark, k, nb) != _bucket_of(spark, 1, nb)
    )
    db = _empty_like(as_bag(b))
    for epoch in (1, 2):
        da = as_bag(
            spark.createDataFrame([(k2, f"a{epoch}")], ["k", "av"])
        )
        assert merge_join_view_epoch(
            state, da, db, on="k", epoch_id=epoch, n_buckets=nb
        )
    # k2 never matched: the view is still just key 1
    assert _bag_dict(read_join_view(spark, state)) == {
        (1, "a1", "b1"): 1
    }
    # ... and a late B-side insert of k2 joins BOTH pending A rows
    db3 = as_bag(spark.createDataFrame([(k2, "b2")], ["k", "bv"]))
    da3 = _empty_like(as_bag(a))
    assert merge_join_view_epoch(
        state, da3, db3, on="k", epoch_id=3, n_buckets=nb
    )
    assert _bag_dict(read_join_view(spark, state)) == {
        (1, "a1", "b1"): 1,
        (k2, "a1", "b2"): 1,
        (k2, "a2", "b2"): 1,
    }


def test_retraction_empties_live_bucket_then_reinserts(spark, tmp_path):
    """A retraction that cancels every row of a live bucket must
    drop that bucket from the mapping (not leave the stale pointer),
    and a later reinsert rebuilds it."""
    state = str(tmp_path / "state")
    a = spark.createDataFrame([(1, "a1")], ["k", "av"])
    b = spark.createDataFrame([(1, "b1")], ["k", "bv"])
    merge_join_view_epoch(
        state, as_bag(a), as_bag(b), on="k", epoch_id=0, n_buckets=4
    )
    da = as_bag(a, -1)  # cancels the only A row -> a/v buckets empty
    db = _empty_like(as_bag(b))
    assert merge_join_view_epoch(
        state, da, db, on="k", epoch_id=1, n_buckets=4
    )
    assert read_join_view(spark, state) is None
    da2 = as_bag(spark.createDataFrame([(1, "a9")], ["k", "av"]))
    assert merge_join_view_epoch(
        state, da2, db, on="k", epoch_id=2, n_buckets=4
    )
    assert _bag_dict(read_join_view(spark, state)) == {
        (1, "a9", "b1"): 1
    }


def test_streaming_wiring_available_now(spark, tmp_path):
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, "a1"), (2, "a2")], ["k", "av"]
    ).write.parquet(src)
    b = spark.createDataFrame([(1, "b1"), (2, "b2")], ["k", "bv"])
    stream = spark.readStream.schema("k bigint, av string").parquet(src)
    q = stream_join_view(
        stream,
        str(tmp_path / "state"),
        str(tmp_path / "ckpt"),
        b_static_bag=as_bag(b),
        on="k",
    )
    q.awaitTermination(120)
    got = _bag_dict(read_join_view(spark, str(tmp_path / "state")))
    want = _bag_dict(
        as_bag(
            spark.createDataFrame(
                [(1, "a1"), (2, "a2")], ["k", "av"]
            ).join(b, "k")
        )
    )
    assert got == want
