"""Streaming incremental dedup — the T-family twin of
operators/incremental.py.

A continuously-ingesting pipeline dedups each micro-batch against the
already-curated corpus: a *stream-static* left join of the stream on
the persisted ``(content_hash, keep_id)`` index (the static side is
re-read per micro-batch, so a replaced index snapshot is picked up
without restarting the query), plus within-stream dedup on the hash
under a watermark so state stays bounded (``dropDuplicates`` without
a watermark grows state forever — not the 100 TB posture).

Ordering note: within-stream "first wins" in a stream is arrival
order, not min-id (micro-batch boundaries are not deterministic), so
the streaming verdict is ``is_new_content`` — content seen neither in
the corpus nor earlier in the stream — rather than the batch form's
min-id survivor. The batch operator stays the oracle for survivor
identity; the stream decides admission.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalize_text


def _is_missing_path(exc: AnalysisException) -> bool:
    """True iff the read failed because the path does not exist (the
    legitimate first-batch case), as opposed to a corrupt or
    transiently unreadable index that must not be overwritten."""
    cond = ""
    for attr in ("getCondition", "getErrorClass"):
        try:
            cond = getattr(exc, attr)() or ""
            break
        except Exception:
            continue
    msg = str(exc)
    return (
        "PATH_NOT_FOUND" in cond
        or "PATH_NOT_FOUND" in msg
        or "Path does not exist" in msg
    )


def stream_dedup_against_index(
    stream: DataFrame,
    index: DataFrame,
    *,
    text_col: str = "text",
    ts_col: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Admission-filtered stream: rows whose normalized content is in
    the corpus index are dropped; repeated content within the stream
    passes once.

    ``index`` is a static DataFrame (e.g. a parquet read of the
    persisted exact index) with a ``content_hash`` column. When
    ``ts_col`` is given, within-stream dedup uses
    ``dropDuplicatesWithinWatermark`` on the hash — bounded state;
    without it, plain ``dropDuplicates`` (exact, unbounded state —
    test/backfill use only).
    """
    hashed = stream.withColumn(
        "content_hash", F.md5(normalize_text(F.col(text_col)))
    )
    # stream-static LEFT ANTI join: only content absent from the
    # corpus survives; the static side shuffles/broadcasts per
    # micro-batch under the batch planner (AQE sizes it)
    fresh = hashed.join(
        index.select("content_hash"), "content_hash", "left_anti"
    )
    if ts_col is not None:
        return fresh.withWatermark(
            ts_col, watermark
        ).dropDuplicatesWithinWatermark(["content_hash"])
    return fresh.dropDuplicates(["content_hash"])


def perceptual_admission_batch(
    batch_hashes: DataFrame,
    index_path: str,
    *,
    id_col: str = "doc_id",
    hash_col: str = "dhash",
    max_hamming: int = 3,
    chunks: int = 4,
    max_posting: int = 100_000,
    append: bool = True,
    batch_id: int | str | None = None,
) -> DataFrame:
    """One micro-batch of the perceptual-dedup admission filter (also
    usable in plain batch backfills) — the signature twin of
    streaming/semantic.py. ``batch_hashes`` is (id, signature), e.g.
    operators/image_hash.image_hashes output; the index at
    ``index_path`` is persisted :func:`~..operators.incremental.
    hamming_signature_index` rows (``sig, rep_id, n_members``).

    Per batch: (1) collapse the batch's identical signatures to their
    min-id rep (the blank-mass bound — one candidate per distinct
    signature no matter how many rows carry it); (2) drop batch reps
    within ``max_hamming`` of any INDEXED signature
    (:func:`~..operators.incremental.hamming_against_index` — exact
    hits short-circuit, banded near hits are posting-capped); (3) drop
    batch reps within range of an ADMITTED smaller-id batch rep
    (greedy pairwise rule — a chain can over-drop relative to full
    clustering, documented and fine for admission); (4) append the
    admitted signature rows so later batches dedup against earlier
    admissions (grow-only index; signature uniqueness holds because
    any exact hit was dropped in step 2). Returns the admitted
    ``(sig, rep_id, n_members)`` rows.

    Durability contract (ADVICE r7): the index is a grow-only set of
    ``batch=b<id>/`` parquet subdirectories — each append lands in
    its own partition directory keyed by ``batch_id`` and OVERWRITES
    only that directory, so a ``foreachBatch`` retry (at-least-once
    delivery) rewrites the same subdir instead of appending duplicate
    signature rows; the one-row-per-distinct-signature invariant
    survives replays. A read failure is only treated as "first batch"
    when the path genuinely does not exist — any other error (corrupt
    footer, transient IO) re-raises rather than silently rebuilding
    an empty index over the accumulated one. Callers that pass no
    ``batch_id`` (plain batch backfills) get a content-derived
    subdir, so re-running the identical backfill step is idempotent
    too, while distinct steps never collide."""
    from ..operators.image_hash import hamming_banded_pairs
    from ..operators.incremental import (
        hamming_against_index,
        hamming_signature_index,
    )

    spark = batch_hashes.sparkSession
    sigs = hamming_signature_index(
        batch_hashes, id_col=id_col, hash_col=hash_col
    ).localCheckpoint(eager=True)
    if batch_id is None:
        # content-derived key: a re-run of the same backfill step
        # overwrites its own subdir; distinct batches don't collide
        fp = sigs.agg(
            F.sum(F.xxhash64("sig")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        batch_id = f"{(fp['s'] or 0) & 0xFFFFFFFFFFFF:x}n{fp['n']}"
    try:
        # batch= partition dirs surface as an inferred column; the
        # index this batch dedups against EXCLUDES its own subdir, so
        # a replayed batch (at-least-once foreachBatch) sees exactly
        # what the first attempt saw and reaches the same admission
        # decision before overwriting its own partition
        index = (
            spark.read.parquet(index_path)
            .filter(F.col("batch") != f"b{batch_id}")
            .select("sig", "rep_id", "n_members")
        )
    except AnalysisException as exc:
        # only a genuinely absent path means "first batch"; corrupt
        # footers / transient IO must re-raise, not silently restart
        # the grow-only index from empty (ADVICE r7)
        if not _is_missing_path(exc):
            raise
        index = spark.createDataFrame(
            [], "sig bigint, rep_id bigint, n_members bigint"
        )
    rep_hashes = sigs.select(
        F.col("rep_id").alias(id_col), F.col("sig").alias(hash_col)
    )
    hit = hamming_against_index(
        rep_hashes,
        index,
        id_col=id_col,
        hash_col=hash_col,
        max_hamming=max_hamming,
        chunks=chunks,
        max_posting=max_posting,
    ).select(F.col("batch_id").alias("rep_id"))
    within = hamming_banded_pairs(
        rep_hashes,
        id_col=id_col,
        hash_col=hash_col,
        max_hamming=max_hamming,
        chunks=chunks,
        max_posting=max_posting,
    ).select(F.col("id_b").alias("rep_id"))
    admitted = (
        sigs.join(hit, "rep_id", "left_anti")
        .join(within, "rep_id", "left_anti")
        .localCheckpoint(eager=True)
    )
    if append:
        admitted.write.mode("overwrite").parquet(
            f"{index_path}/batch=b{batch_id}"
        )
    return admitted


def stream_perceptual_admission(
    hash_stream: DataFrame,
    index_path: str,
    *,
    id_col: str = "doc_id",
    hash_col: str = "dhash",
    max_hamming: int = 3,
    chunks: int = 4,
    max_posting: int = 100_000,
    sink=None,
):
    """``foreachBatch`` writer for the perceptual admission filter:
    ``hash_stream`` carries (id, signature) rows (hash upstream with
    the image/audio/video fingerprint UDFs). ``sink(admitted_df,
    batch_id)`` sees each batch's admissions after the index append;
    returns the DataStreamWriter — caller sets trigger/checkpoint."""

    def process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        admitted = perceptual_admission_batch(
            batch,
            index_path,
            id_col=id_col,
            hash_col=hash_col,
            max_hamming=max_hamming,
            chunks=chunks,
            max_posting=max_posting,
            append=True,
            # at-least-once foreachBatch: keying the index write on
            # the engine's batch_id makes a replayed batch overwrite
            # its own subdir instead of double-appending (ADVICE r7)
            batch_id=batch_id,
        )
        if sink is not None:
            sink(admitted, batch_id)

    return hash_stream.writeStream.foreachBatch(process)
