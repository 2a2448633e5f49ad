"""Streaming contract monitor: cross-epoch accumulation, replay
idempotence, streaming wiring."""

from pyspark.sql import functions as F

from accounting_etl_spark.streaming.monitor import (
    monitor_epoch,
    read_monitor,
    stream_contract_monitor,
)

def _rules():
    # Column exprs must not be built at module import time (no
    # SparkContext during collection)
    return [
        ("amount_positive", F.col("amount") <= 0),
        ("amount_not_null", F.col("amount").isNull()),
    ]


def _state(spark, state_dir):
    return {
        r.check: (r.violations, r.checked)
        for r in read_monitor(spark, state_dir).collect()
    }


def test_counters_accumulate_across_epochs(spark, tmp_path):
    state = str(tmp_path / "mon")
    b0 = spark.createDataFrame(
        [(1, 10.0), (2, -1.0), (3, None)], ["id", "amount"]
    )
    b1 = spark.createDataFrame([(4, -2.0), (5, 5.0)], ["id", "amount"])
    assert monitor_epoch(state, b0, _rules(), 0)
    assert _state(spark, state) == {
        "amount_positive": (1, 3),
        "amount_not_null": (1, 3),
    }
    assert monitor_epoch(state, b1, _rules(), 1)
    assert _state(spark, state) == {
        "amount_positive": (2, 5),
        "amount_not_null": (1, 5),
    }


def test_committed_replay_is_a_noop(spark, tmp_path):
    state = str(tmp_path / "mon")
    b = spark.createDataFrame([(1, -1.0)], ["id", "amount"])
    assert monitor_epoch(state, b, _rules(), 0)
    before = _state(spark, state)
    assert not monitor_epoch(state, b, _rules(), 0)
    assert _state(spark, state) == before


def test_streaming_wiring_available_now(spark, tmp_path):
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, 10.0), (2, -3.0), (3, -4.0)], ["id", "amount"]
    ).write.parquet(src)
    stream = spark.readStream.schema("id bigint, amount double").parquet(
        src
    )
    q = stream_contract_monitor(
        stream, str(tmp_path / "mon"), str(tmp_path / "ckpt"), _rules()
    )
    q.awaitTermination(120)
    assert _state(spark, str(tmp_path / "mon")) == {
        "amount_positive": (2, 3),
        "amount_not_null": (0, 3),
    }
