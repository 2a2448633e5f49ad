"""Streaming semantic admission (streaming/semantic.py): within-batch
SemDeDup, index-probe rejection, grow-on-admit across micro-batches."""

from __future__ import annotations

import json
import uuid

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _emb_rows(spark, n=64):
    from accounting_etl_spark.sources.tables import load_table

    return (
        load_table(spark, SF_SMOKE, "embeddings")
        .filter(F.col("vec_id") < n)
        .collect()
    )


def _build_index(spark, tmp_path, rows):
    from accounting_etl_spark.operators.ann_index import build_ivf_index

    path = str(tmp_path / "ivf")
    df = spark.createDataFrame(
        [(r["vec_id"], r["embedding"]) for r in rows],
        "vec_id long, embedding array<float>",
    )
    build_ivf_index(df, path, n_cells=4)
    return path


def test_batch_admission_rejects_indexed_clone(spark, tmp_path):
    from accounting_etl_spark.streaming.semantic import (
        semantic_admission_batch,
    )

    rows = _emb_rows(spark)
    path = _build_index(spark, tmp_path, rows[:32])
    # batch: a clone of indexed vector 5 (cosine 1 → reject) and a
    # fresh vector 40 (not indexed → admit)
    batch = spark.createDataFrame(
        [
            (1005, rows[5]["embedding"]),
            (1040, rows[40]["embedding"]),
        ],
        "vec_id long, embedding array<float>",
    )
    admitted = semantic_admission_batch(
        batch, path, threshold=0.99, append=True
    )
    got = {r["vec_id"] for r in admitted.collect()}
    assert got == {1040}
    # the admitted vector grew the index: re-submitting it is rejected
    again = semantic_admission_batch(
        spark.createDataFrame(
            [(2040, rows[40]["embedding"])],
            "vec_id long, embedding array<float>",
        ),
        path,
        threshold=0.99,
        append=False,
    )
    assert again.count() == 0


def test_batch_admission_within_batch_dedup(spark, tmp_path):
    from accounting_etl_spark.streaming.semantic import (
        semantic_admission_batch,
    )

    rows = _emb_rows(spark)
    path = _build_index(spark, tmp_path, rows[:8])
    # two copies of the same unseen vector in ONE batch: min-id wins
    batch = spark.createDataFrame(
        [
            (3000, rows[50]["embedding"]),
            (3001, rows[50]["embedding"]),
        ],
        "vec_id long, embedding array<float>",
    )
    admitted = semantic_admission_batch(
        batch, path, threshold=0.99, append=False
    )
    assert {r["vec_id"] for r in admitted.collect()} == {3000}


def test_stream_admission_across_microbatches(spark, tmp_path):
    from accounting_etl_spark.streaming.semantic import (
        stream_semantic_admission,
    )

    rows = _emb_rows(spark)
    path = _build_index(spark, tmp_path, rows[:16])
    src = tmp_path / "src"
    src.mkdir()

    def write_batch(name, entries):
        with open(src / f"{name}.json", "w") as f:
            for vid, emb in entries:
                f.write(
                    json.dumps({"vec_id": vid, "embedding": list(map(float, emb))})
                    + "\n"
                )

    # epoch 1: one indexed clone (reject), one fresh (admit)
    write_batch("b1", [(5005, rows[5]["embedding"]), (5030, rows[30]["embedding"])])
    stream = spark.readStream.schema(
        "vec_id long, embedding array<float>"
    ).json(str(src))
    seen: list[tuple[int, int]] = []

    def sink(df, bid):
        seen.extend((bid, r["vec_id"]) for r in df.collect())

    q = (
        stream_semantic_admission(stream, path, threshold=0.99, sink=sink)
        .option("checkpointLocation", str(tmp_path / f"ck_{uuid.uuid4().hex[:8]}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert [v for _, v in seen] == [5030]
    # epoch 2: clone of the epoch-1 admission → rejected (index grew)
    write_batch("b2", [(6030, rows[30]["embedding"]), (6031, rows[45]["embedding"])])
    q2 = (
        stream_semantic_admission(stream, path, threshold=0.99, sink=sink)
        .option("checkpointLocation", str(tmp_path / f"ck_{uuid.uuid4().hex[:8]}"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    admitted_2 = {v for _, v in seen[1:]}
    assert 6031 in admitted_2 and 6030 not in admitted_2
