"""Distributed prefix-sum / sequence-packing (operators/packing.py)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from accounting_etl_spark.operators.packing import pack_sequences, prefix_sum


def _sized(spark, n=997, seed_mod=37):
    # deterministic irregular sizes, ids deliberately unsorted on write
    rows = [(i, 1 + (i * i) % seed_mod) for i in range(n)]
    rows = rows[1::2] + rows[0::2]
    return spark.createDataFrame(rows, ["doc_id", "n_tokens"]).repartition(7)


def test_prefix_sum_matches_single_partition_window(spark):
    df = _sized(spark)
    got = prefix_sum(
        df, order_col="doc_id", value_col="n_tokens", num_partitions=8
    )
    w = Window.orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = df.withColumn("cum", F.sum("n_tokens").over(w))
    assert (
        got.select("doc_id", "cum").sort("doc_id").collect()
        == want.select("doc_id", "cum").sort("doc_id").collect()
    )
    # the scan must really fan out: >1 range partition carried rows
    n_pids = (
        df.repartitionByRange(8, "doc_id")
        .select(F.spark_partition_id().alias("p"))
        .distinct()
        .count()
    )
    assert n_pids > 1


def test_prefix_sum_no_global_single_partition_window(spark):
    """The plan must not contain an unpartitioned data-sized sort:
    every window spec either keys on __pid or runs on the N-row
    offsets side."""
    df = _sized(spark)
    plan = prefix_sum(
        df, order_col="doc_id", value_col="n_tokens", num_partitions=8
    )._jdf.queryExecution().executedPlan().toString()
    import re

    for m in re.finditer(r"Window \[(.*?)\]", plan):
        spec = m.group(1)
        assert "__pid" in spec, f"unpartitioned window in plan: {spec}"


def test_pack_sequences_coordinates(spark):
    df = spark.createDataFrame(
        [(1, 100), (2, 412), (3, 512), (4, 1), (5, 1030)],
        ["doc_id", "n_tokens"],
    )
    got = {
        r.doc_id: r
        for r in pack_sequences(df, seq_len=512, num_partitions=3).collect()
    }
    # doc 1: tokens 0-99 in seq 0
    assert (got[1].seq_id, got[1].seq_offset, got[1].spans_boundary) == (
        0, 0, False,
    )
    # doc 2: tokens 100-511 exactly fills seq 0
    assert (got[2].seq_id, got[2].end_seq_id, got[2].spans_boundary) == (
        0, 0, False,
    )
    # doc 3: tokens 512-1023 = all of seq 1
    assert (got[3].seq_id, got[3].seq_offset, got[3].spans_boundary) == (
        1, 0, False,
    )
    # doc 4: token 1024 opens seq 2
    assert (got[4].seq_id, got[4].seq_offset) == (2, 0)
    # doc 5: tokens 1025-2054 spans seqs 2-4
    assert (got[5].seq_id, got[5].end_seq_id, got[5].spans_boundary) == (
        2, 4, True,
    )
    assert got[5].cum_tokens == 100 + 412 + 512 + 1 + 1030
