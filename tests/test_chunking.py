"""Document chunking invariants (operators/chunking.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_chunking_covers_every_token(spark):
    from accounting_etl_spark.operators.chunking import chunk_documents

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(100)
    chunks = chunk_documents(docs, size=32, step=24)
    stats = (
        chunks.groupBy("doc_id")
        .agg(
            F.max(F.col("start_token") + F.col("n_tokens") - 1).alias("reach"),
            F.count(F.lit(1)).alias("k"),
            F.min("n_tokens").alias("min_n"),
            F.max("n_tokens").alias("max_n"),
        )
        .join(
            docs.select(
                "doc_id", F.size(F.split(F.trim("text"), " ")).alias("n")
            ),
            "doc_id",
        )
    ).toPandas()
    assert len(stats) == 100
    # the last chunk reaches the last token exactly
    assert (stats["reach"] == stats["n"]).all()
    assert (stats["max_n"] <= 32).all()
    # long docs: all chunks full-size; short docs: single whole-doc chunk
    long = stats[stats["n"] >= 32]
    assert (long["min_n"] == 32).all()
    short = stats[stats["n"] < 32]
    assert (short["k"] == 1).all() and (short["min_n"] == short["n"]).all()


def test_chunking_reconstructs_with_no_overlap(spark):
    """step == size on an aligned doc: concatenating chunks in order
    reproduces the doc exactly."""
    from accounting_etl_spark.operators.chunking import chunk_documents

    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(12)))], "doc_id bigint, text string"
    )
    got = (
        chunk_documents(docs, size=4, step=4)
        .orderBy("chunk_idx")
        .select("chunk")
        .collect()
    )
    assert " ".join(r.chunk for r in got) == " ".join(
        f"t{i}" for i in range(12)
    )


def test_chunking_tail_chunk_overlaps_when_unaligned(spark):
    """An unaligned doc gets a final FULL-size chunk anchored to the
    last token (overlapping the previous chunk) — never a token drop,
    never a short tail when n >= size."""
    from accounting_etl_spark.operators.chunking import chunk_documents

    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10)))], "doc_id bigint, text string"
    )
    rows = (
        chunk_documents(docs, size=4, step=4).orderBy("chunk_idx").collect()
    )
    assert [(r.start_token, r.chunk) for r in rows] == [
        (1, "t0 t1 t2 t3"),
        (5, "t4 t5 t6 t7"),
        (7, "t6 t7 t8 t9"),
    ]


def test_chunking_rejects_bad_params(spark):
    from accounting_etl_spark.operators.chunking import chunk_documents

    docs = spark.createDataFrame([(1, "a b c")], "doc_id bigint, text string")
    with pytest.raises(ValueError):
        chunk_documents(docs, size=4, step=5)
