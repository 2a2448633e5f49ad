"""Training-shard export (sinks/training_export.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from accounting_etl_spark.sinks.training_export import (
    assign_shards,
    export_training_shards,
)
from tests.conftest import SF_SMOKE


def _docs(spark):
    from accounting_etl_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    return docs.select(
        "doc_id",
        "text",
        F.size(F.split(F.trim("text"), " ")).cast("bigint").alias("n_tokens"),
    )


def test_shards_are_token_bounded_and_deterministic(spark):
    docs = _docs(spark)
    a = assign_shards(docs, shard_tokens=5000).collect()
    b = assign_shards(docs, shard_tokens=5000).collect()
    assert {(r["doc_id"], r["shard"]) for r in a} == {
        (r["doc_id"], r["shard"]) for r in b
    }
    # per-shard token totals: every shard except possibly those
    # holding an oversized doc stays under budget + one doc overhang
    per = {}
    for r in a:
        per.setdefault(r["shard"], []).append(r["n_tokens"])
    for shard, toks in per.items():
        # a shard's EXCLUSIVE start is < (shard+1)*budget, so total
        # ≤ budget + last doc; with fixture docs ≪ budget this means
        # total < budget + max doc size
        assert sum(toks) < 5000 + max(toks), shard
    # shards are contiguous 0..max
    assert sorted(per) == list(range(len(per)))


def test_pseudo_shuffle_breaks_source_order(spark):
    docs = _docs(spark)
    sharded = assign_shards(docs, shard_tokens=2000)
    # doc_ids 0..9 (adjacent in source order) must not all land in the
    # same shard under the hash shuffle
    first10 = {
        r["shard"]
        for r in sharded.filter(F.col("doc_id") < 10).collect()
    }
    assert len(first10) > 1


def test_export_roundtrip_parquet_and_manifest(spark, tmp_path):
    docs = _docs(spark)
    path = str(tmp_path / "out")
    manifest = export_training_shards(
        docs, path, shard_tokens=5000
    ).collect()
    back = spark.read.parquet(f"{path}/shards")
    assert back.count() == docs.count()
    assert set(back.select("doc_id").toPandas()["doc_id"]) == set(
        docs.select("doc_id").toPandas()["doc_id"]
    )
    m = {r["shard"]: (r["n_docs"], r["n_tokens"]) for r in manifest}
    got = {
        r["shard"]: (r["n"], r["tok"])
        for r in back.groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_tokens").alias("tok"))
        .collect()
    }
    assert got == m
    saved = spark.read.parquet(f"{path}/_manifest")
    assert {tuple(r) for r in saved.collect()} == {
        (r["shard"], r["n_docs"], r["n_tokens"]) for r in manifest
    }


def test_export_json_lines(spark, tmp_path):
    docs = _docs(spark).limit(50)
    path = str(tmp_path / "out_json")
    export_training_shards(docs, path, shard_tokens=3000, fmt="json")
    back = spark.read.json(f"{path}/shards")
    assert back.count() == 50
    assert "text" in back.columns and "shard" in back.columns
