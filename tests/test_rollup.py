"""Continuous rollup maintenance (streaming/rollup.py): incremental
(bucket, key) partial aggregates must equal the one-shot batch
aggregate after any epoch sequence, replays must be no-ops, and
untouched buckets must never be rewritten."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from accounting_etl_spark.streaming.rollup import (
    merge_epoch,
    read_rollup,
    serve,
    stream_rollup,
)

AGGS = [
    ("total", "sum", "amount"),
    ("n", "count", "amount"),
    ("lo", "min", "amount"),
    ("hi", "max", "amount"),
]


def _batch(spark, rows):
    df = spark.createDataFrame(
        rows, "day string, kind string, amount_raw bigint"
    )
    # decimal money column: partial merges reorder reduction and
    # decimal is the order-independent type (detsum contract)
    return df.select(
        "day", "kind",
        (F.col("amount_raw").cast("decimal(18,2)") / 100).alias("amount"),
    )


def _expected(spark, all_rows):
    return {
        (r["day"], r["kind"]): (str(r["total"]), r["n"], str(r["lo"]), str(r["hi"]))
        for r in _batch(spark, all_rows)
        .groupBy("day", "kind")
        .agg(
            F.sum("amount").alias("total"),
            F.count("amount").alias("n"),
            F.min("amount").alias("lo"),
            F.max("amount").alias("hi"),
        )
        .collect()
    }


def _state(spark, state_dir):
    return {
        (r["day"], r["kind"]): (str(r["total"]), r["n"], str(r["lo"]), str(r["hi"]))
        for r in read_rollup(spark, state_dir).collect()
    }


def test_incremental_merge_equals_batch_aggregate(spark, tmp_path):
    state = str(tmp_path / "state")
    e0 = [("d1", "a", 100), ("d1", "a", 250), ("d1", "b", 40), ("d2", "a", 7)]
    e1 = [("d1", "a", 300), ("d2", "b", 11), ("d3", "a", 5)]
    merge_epoch(state, _batch(spark, e0), bucket_col="day", keys=["kind"],
                aggs=AGGS, epoch_id=0)
    merge_epoch(state, _batch(spark, e1), bucket_col="day", keys=["kind"],
                aggs=AGGS, epoch_id=1)
    assert _state(spark, state) == _expected(spark, e0 + e1)


def test_committed_replay_is_noop(spark, tmp_path):
    state = str(tmp_path / "state")
    e0 = [("d1", "a", 100), ("d1", "b", 50)]
    b = _batch(spark, e0)
    assert merge_epoch(state, b, bucket_col="day", keys=["kind"],
                       aggs=AGGS, epoch_id=0)
    # at-least-once replay of the same epoch: early return, no
    # double-count
    assert not merge_epoch(state, b, bucket_col="day", keys=["kind"],
                           aggs=AGGS, epoch_id=0)
    assert _state(spark, state) == _expected(spark, e0)


def test_untouched_buckets_not_rewritten(spark, tmp_path):
    state = str(tmp_path / "state")
    merge_epoch(state, _batch(spark, [("d1", "a", 1), ("d2", "a", 2)]),
                bucket_col="day", keys=["kind"], aggs=AGGS, epoch_id=0)
    d1_files = sorted(glob.glob(f"{state}/epoch=00000000/__pb=d1/*.parquet"))
    assert d1_files
    mtimes = {f: os.path.getmtime(f) for f in d1_files}
    # epoch 1 touches only d2: d1's live directory must be byte-stable
    merge_epoch(state, _batch(spark, [("d2", "a", 5), ("d2", "b", 9)]),
                bucket_col="day", keys=["kind"], aggs=AGGS, epoch_id=1)
    assert {f: os.path.getmtime(f) for f in d1_files} == mtimes
    from accounting_etl_spark.streaming.rollup import _read_manifest

    m = _read_manifest(state)
    assert m["buckets"]["d1"].endswith("epoch=00000000/__pb=d1")
    assert m["buckets"]["d2"].endswith("epoch=00000001/__pb=d2")


def test_serve_rolls_up_to_coarser_grain(spark, tmp_path):
    state = str(tmp_path / "state")
    rows = [("d1", "a", 100), ("d1", "b", 200), ("d2", "a", 300)]
    merge_epoch(state, _batch(spark, rows), bucket_col="day", keys=["kind"],
                aggs=AGGS, epoch_id=0)
    from decimal import Decimal

    by_kind = {
        r["kind"]: (Decimal(r["total"]), r["n"])
        for r in serve(read_rollup(spark, state), ["kind"], AGGS)
        .select("kind", "total", "n")
        .collect()
    }
    assert by_kind == {"a": (Decimal("4.00"), 2), "b": (Decimal("2.00"), 1)}


def test_stream_rollup_end_to_end(spark, tmp_path):
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    rows = [("d1", "a", 100), ("d1", "a", 23), ("d2", "b", 40)]
    b = _batch(spark, rows)
    b.write.parquet(src)
    stream = spark.readStream.schema(b.schema).parquet(src)
    q = stream_rollup(stream, state, ckpt, bucket_col="day", keys=["kind"],
                      aggs=AGGS)
    q.awaitTermination(120)
    assert _state(spark, state) == _expected(spark, rows)
    # second file lands -> restart picks up only the new data
    more = [("d1", "a", 7), ("d3", "c", 1)]
    _batch(spark, more).write.mode("append").parquet(src)
    q2 = stream_rollup(stream, state, ckpt, bucket_col="day", keys=["kind"],
                       aggs=AGGS)
    q2.awaitTermination(120)
    assert _state(spark, state) == _expected(spark, rows + more)
