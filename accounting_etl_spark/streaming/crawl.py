"""Streaming crawl ingestion — WARC archives in, curated text out.

The production shape of continuous crawl intake: archive files are
immutable blobs on shared storage, and the *stream* is the manifest
log their writer appends (one JSON line per completed archive — the
shape ``sources/warc.write_warc_files`` returns). Structured
Streaming's file sources can't split binary archives, so the JSON
manifest stream is the checkpointed exactly-once spine, and each
micro-batch does a bounded *batch* ``binaryFile`` read of exactly the
archives its manifests name:

    manifests (readStream.json) ─ foreachBatch ─▶
        read_warc(named files) → extract_html → exact-dedup admission
        (left-anti vs the persisted hash index) → per-epoch parquet
        append + index growth

Exactly-once: outputs land under ``epoch=<id>`` directories written
with overwrite, and the index grows by whole epoch directories too —
a replayed epoch rewrites the same paths instead of duplicating
(the replay-guard contract of ``streaming/ingest.foreach_batch_upsert``).
The driver only ever touches manifest rows (file names), never record
bytes.
"""

from __future__ import annotations

import glob as _glob
import os
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import normalize_text

MANIFEST_SCHEMA = "file string, n_records bigint, n_bytes bigint"


def append_manifest(manifest_dir: str, rows, epoch: str) -> str:
    """Write one manifest JSON-lines file (the crawl writer's commit
    record). ``rows`` = (file, n_records, n_bytes) tuples or Rows."""
    import json

    os.makedirs(manifest_dir, exist_ok=True)
    path = os.path.join(manifest_dir, f"manifest-{epoch}.json")
    with open(path, "w") as f:
        for r in rows:
            f.write(
                json.dumps(
                    {
                        "file": r["file"] if not isinstance(r, tuple) else r[0],
                        "n_records": r["n_records"] if not isinstance(r, tuple) else r[1],
                        "n_bytes": r["n_bytes"] if not isinstance(r, tuple) else r[2],
                    }
                )
                + "\n"
            )
    return path


def stream_manifests(spark: SparkSession, manifest_dir: str) -> DataFrame:
    return spark.readStream.schema(MANIFEST_SCHEMA).json(manifest_dir)


def crawl_admission_batch(
    spark: SparkSession,
    files: list[str],
    *,
    out_dir: str,
    idx_dir: str,
    epoch_id: int,
    max_link_density: tuple[int, int] = (1, 2),
) -> Optional[DataFrame]:
    """ONE epoch of crawl admission as a pure batch function — the
    ``foreachBatch`` body of :func:`crawl_ingest`, factored out so the
    driver registry can replay the state machine deterministically
    (VERDICT r8 Next #3, the perceptual-admission 'admit' pattern):
    parse the named archives, extract main text, admission-filter
    against every OTHER epoch's persisted content-hash index, land
    ``out_dir/epoch=<id>`` + grow ``idx_dir/epoch=<id>`` (both
    overwrite — at-least-once replays rewrite the same paths), and
    return the admitted rows read back FROM the landed files (so the
    caller sees exactly what durably exists). None when no archive
    named by ``files`` exists."""
    from ..operators.html_extract import extract_html
    from ..sources.warc import read_warc

    files = [f for f in files if f and os.path.exists(f)]
    if not files:
        return None
    recs = read_warc(spark, files).select(
        F.regexp_extract("record_id", r"doc-(\d+)", 1)
        .cast("bigint")
        .alias("doc_id"),
        "target_uri",
        F.col("payload").cast("string").alias("html"),
    )
    ex = extract_html(
        recs,
        html_col="html",
        base_col="target_uri",
        max_link_density=max_link_density,
    ).withColumn("content_hash", F.md5(normalize_text(F.col("text"))))
    # corpus admission: content already in the index never lands;
    # within-epoch repeats collapse to the min doc_id
    # replay safety: a re-run epoch must NOT see its own partial
    # index write from the failed attempt, or it would reject its
    # whole batch — admission reads every epoch directory but the
    # current one
    index_dirs = [
        d
        for d in _glob.glob(os.path.join(idx_dir, "epoch=*"))
        if not d.endswith(f"epoch={epoch_id}")
    ]
    if index_dirs:
        idx = spark.read.parquet(*index_dirs).select("content_hash")
        fresh = ex.join(idx, "content_hash", "left_anti")
    else:
        fresh = ex
    w = Window.partitionBy("content_hash")
    admitted = (
        fresh.withColumn("__keep", F.min("doc_id").over(w))
        .where(F.col("doc_id") == F.col("__keep"))
        .drop("__keep")
    )
    # replay-guarded epoch writes: same epoch → same paths, overwrite.
    # The index derives from the LANDED parquet, not the logical plan:
    # one extraction pass per epoch instead of two (the landing write
    # is the only job that runs the WARC parse + main-text pipeline),
    # and the index can never disagree with what durably landed.
    landed_path = os.path.join(out_dir, f"epoch={epoch_id}")
    admitted.write.mode("overwrite").parquet(landed_path)
    landed = spark.read.parquet(landed_path)
    landed.select("content_hash").distinct().write.mode(
        "overwrite"
    ).parquet(os.path.join(idx_dir, f"epoch={epoch_id}"))
    return landed


def crawl_ingest(
    spark: SparkSession,
    manifest_dir: str,
    out_dir: str,
    *,
    index_dir: Optional[str] = None,
    max_link_density: tuple[int, int] = (1, 2),
    sink: Callable[[DataFrame, int], None] | None = None,
):
    """``foreachBatch`` writer: archives named by new manifests are
    parsed, extracted, admission-filtered against the persisted
    content-hash index, and appended under ``out_dir/epoch=<id>``
    (the per-epoch work is :func:`crawl_admission_batch`).

    Returns the ``DataStreamWriter``; caller sets trigger/checkpoint
    and starts. The per-epoch collect is of MANIFEST rows only
    (bounded by archives-per-epoch, never records). The index grows
    one ``epoch=<id>`` directory per micro-batch — long-running
    queries should periodically fold old epochs together with
    ``operators/layout.compact`` (file-count maintenance, exactly the
    persisted-ANN-index pattern)."""
    idx_dir = index_dir or os.path.join(out_dir, "_content_index")
    os.makedirs(idx_dir, exist_ok=True)

    def process(batch: DataFrame, epoch_id: int) -> None:
        files = [r["file"] for r in batch.select("file").collect()]
        landed = crawl_admission_batch(
            spark,
            files,
            out_dir=out_dir,
            idx_dir=idx_dir,
            epoch_id=epoch_id,
            max_link_density=max_link_density,
        )
        if landed is not None and sink is not None:
            sink(landed, epoch_id)

    return stream_manifests(spark, manifest_dir).writeStream.foreachBatch(
        process
    )
