"""Streaming crawl ingestion (streaming/crawl.py): manifest-driven
WARC intake, extraction, cross-epoch exact-dedup admission, replay
idempotence."""

from __future__ import annotations

import os
import uuid

from pyspark.sql import functions as F


def _write_archive(spark, tmp_path, name, pages):
    """pages: list of (doc_id, url, body_text). Returns manifest rows."""
    from accounting_etl_spark.sources.warc import write_warc_files

    rows = [
        (
            did,
            url,
            f"<html><head><title>d{did}</title></head><body>"
            f"<p>{body}</p></body></html>",
        )
        for did, url, body in pages
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, url string, html string"
    ).coalesce(1)
    return write_warc_files(df, str(tmp_path / name)).collect()


def _run_epoch(spark, tmp_path, out, manifest_dir):
    from accounting_etl_spark.streaming.crawl import crawl_ingest

    q = (
        crawl_ingest(spark, str(manifest_dir), str(out))
        .option(
            "checkpointLocation",
            str(tmp_path / f"ck_{uuid.uuid4().hex[:8]}"),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_crawl_ingest_two_epochs_dedup_and_grow(spark, tmp_path):
    from accounting_etl_spark.streaming.crawl import append_manifest

    manifest_dir = tmp_path / "manifests"
    out = tmp_path / "curated"

    # epoch A: two unique pages + an in-batch duplicate body
    man_a = _write_archive(
        spark,
        tmp_path,
        "arc_a",
        [
            (1, "http://a.test/1", "alpha body one"),
            (2, "http://a.test/2", "beta body two"),
            (3, "http://a.test/3", "alpha body one"),  # dup of 1
        ],
    )
    append_manifest(str(manifest_dir), man_a, "a")
    _run_epoch(spark, tmp_path, out, manifest_dir)

    got = spark.read.parquet(str(out / "epoch=*"))
    ids = {r["doc_id"] for r in got.collect()}
    assert ids == {1, 2}  # in-batch dup collapsed to min doc_id

    # epoch B: one clone of epoch-A content + one fresh page
    man_b = _write_archive(
        spark,
        tmp_path,
        "arc_b",
        [
            (10, "http://b.test/10", "beta body two"),  # corpus dup
            (11, "http://b.test/11", "gamma body three"),
        ],
    )
    append_manifest(str(manifest_dir), man_b, "b")
    _run_epoch(spark, tmp_path, out, manifest_dir)

    ids = {r["doc_id"] for r in spark.read.parquet(str(out / "epoch=*")).collect()}
    assert ids == {1, 2, 11}  # 10 rejected against the grown index

    # extraction really ran: text is the de-templated body
    texts = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(str(out / "epoch=*")).collect()
    }
    assert texts[11] == "gamma body three"
    assert texts[1] == "alpha body one"


def test_crawl_ingest_replay_is_idempotent(spark, tmp_path):
    """Re-running an epoch (fresh checkpoint, same manifests) rewrites
    the same epoch outputs instead of rejecting its own content or
    duplicating rows."""
    from accounting_etl_spark.streaming.crawl import append_manifest

    manifest_dir = tmp_path / "manifests"
    out = tmp_path / "curated"
    man = _write_archive(
        spark, tmp_path, "arc", [(7, "http://r.test/7", "replay body")]
    )
    append_manifest(str(manifest_dir), man, "r")
    _run_epoch(spark, tmp_path, out, manifest_dir)
    first = spark.read.parquet(str(out / "epoch=*")).collect()
    assert {r["doc_id"] for r in first} == {7}

    # replay: NEW checkpoint reprocesses the same manifest as epoch 0
    # again — the index exclusion rule must keep doc 7 admitted
    _run_epoch(spark, tmp_path, out, manifest_dir)
    again = spark.read.parquet(str(out / "epoch=*")).collect()
    assert {r["doc_id"] for r in again} == {7}
    assert len(again) == 1


def test_manifest_roundtrip(tmp_path):
    from accounting_etl_spark.streaming.crawl import append_manifest

    p = append_manifest(
        str(tmp_path / "m"), [("f1.warc.gz", 3, 100)], "e1"
    )
    assert os.path.exists(p)
    import json

    rows = [json.loads(l) for l in open(p)]
    assert rows == [{"file": "f1.warc.gz", "n_records": 3, "n_bytes": 100}]


def test_crawl_admission_driver_variant(spark):
    """The 'crawl' registry variant replays the two-epoch admission
    deterministically: planted decade-slice clones (m=8→2 within
    epoch 1, m=9→1 within epoch 2) collapse to their min doc_id, the
    cross-epoch clones (m=7→0) are rejected by the index probe, and
    everything else is admitted exactly once."""
    from tests.conftest import SF_SMOKE

    from accounting_etl_spark.queries.multimodal import q_crawl_admission

    rows = q_crawl_admission(spark, SF_SMOKE).collect()
    by_epoch = {1: set(), 2: set()}
    hashes = {}
    for r in rows:
        by_epoch[r["hamming"]].add(r["id_a"])
        hashes[r["id_a"]] = r["id_b"]
    admitted = by_epoch[1] | by_epoch[2]
    # each planted clone class is absent; its source doc is present
    assert not any(i % 10 in (7, 8, 9) for i in admitted)
    assert all(i in by_epoch[1] for i in admitted if i % 10 == 0)
    # clone source and clone share a content hash by construction, so
    # the admitted m=2 docs carry the same id_b their m=8 twins had —
    # verify content hashing by checking uniqueness: every admitted
    # hash is distinct (one survivor per content family)
    assert len(set(hashes.values())) == len(hashes)
    # determinism: a second replay (fresh scratch) lands the same rows
    again = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in q_crawl_admission(spark, SF_SMOKE).collect()
    }
    assert again == {(r["id_a"], r["id_b"], r["hamming"]) for r in rows}
