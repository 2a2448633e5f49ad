"""Incremental dedup — new batches against a stored corpus index.

A pipeline that continuously ingests data cannot re-shingle 100 TB of
already-curated corpus for every new batch. The scale shape is an
*index*: a small-per-doc state table persisted once and joined by each
batch —

- exact: ``(content_hash, keep_id)``, one row per distinct normalized
  content (:func:`exact_hash_index`);
- near-dup: the MinHash band-key table ``(doc_id, band, key)``
  (:func:`~.dedup.minhash_bands`), ``bands`` rows per doc.

Batch joins shuffle on the hash / band key only; the corpus index side
is corpus-sized so it is NEVER broadcast-hinted (AQE may still choose
broadcast when it is genuinely small). Survivor semantics differ from
a full recompute on purpose: the corpus is immutable — a batch doc
whose content already exists keeps the *corpus* survivor id even if
the batch doc's id is smaller, because the corpus copy is the one
already published downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import normalize_text
from .dedup import minhash_bands


def exact_hash_index(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """``(content_hash, keep_id)`` — the exact-dedup corpus state.

    One shuffle on the md5 of the normalized text; the survivor is the
    minimum id (deterministic). Persist this instead of the corpus.
    """
    return (
        docs.select(
            F.md5(normalize_text(F.col(text_col))).alias("content_hash"),
            F.col(id_col),
        )
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keep_id"))
    )


def dedup_against_index(
    batch: DataFrame,
    index: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-batch-doc exact-dedup verdict against a corpus index.

    Adds ``content_hash``, ``exact_dup_corpus`` (content already in
    the corpus), ``keep_id`` (the corpus survivor when present, else
    the batch-local min id — a batch can self-duplicate), ``is_dup``.

    One shuffle on ``content_hash`` shared by the left join and the
    batch-local min window (same key → Catalyst reuses the exchange).
    """
    hashed = batch.withColumn(
        "content_hash", F.md5(normalize_text(F.col(text_col)))
    )
    joined = hashed.join(
        index.select(
            "content_hash", F.col("keep_id").alias("__corpus_keep")
        ),
        "content_hash",
        "left",
    )
    w = Window.partitionBy("content_hash")
    return (
        joined.withColumn("__batch_keep", F.min(id_col).over(w))
        .withColumn("exact_dup_corpus", F.col("__corpus_keep").isNotNull())
        .withColumn(
            "keep_id", F.coalesce("__corpus_keep", "__batch_keep")
        )
        .withColumn("is_dup", F.col(id_col) != F.col("keep_id"))
        .drop("__corpus_keep", "__batch_keep")
    )


def minhash_band_index(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k_shingle: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """The persistable near-dup corpus state: ``(id_col, band, key)``.

    Thin alias of :func:`~.dedup.minhash_bands` — named separately so
    call sites read as index-build vs candidate generation.
    """
    return minhash_bands(
        docs,
        id_col=id_col,
        text_col=text_col,
        k_shingle=k_shingle,
        num_hashes=num_hashes,
        bands=bands,
    )


def near_dup_against_index(
    batch: DataFrame,
    band_index: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k_shingle: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    max_bucket: int = 256,
) -> DataFrame:
    """Candidate near-dup links ``(batch_id, corpus_id)`` between a new
    batch and an indexed corpus.

    The batch's band keys (bands × |batch| rows) equi-join the corpus
    band index on (band, key) — only colliding keys ever meet; no
    all-pairs stage, and the corpus text is never touched. Hot buckets
    (boilerplate keys) are capped at ``max_bucket`` corpus ids per
    (band, key) — deterministic min-id prefix, same overflow policy as
    the self-join pair stage; truncation costs recall only on
    degenerate buckets that exact verification would prune anyway.
    Candidates need exact verification downstream (Jaccard on the
    pair's texts) exactly like :func:`~.dedup.minhash_candidates`.
    """
    bb = minhash_bands(
        batch,
        id_col=id_col,
        text_col=text_col,
        k_shingle=k_shingle,
        num_hashes=num_hashes,
        bands=bands,
    ).withColumnRenamed(id_col, "batch_id")
    idx_lists = (
        band_index.groupBy("band", "key")
        .agg(
            F.slice(
                F.sort_array(F.collect_set(F.col(id_col))), 1, max_bucket
            ).alias("__ids")
        )
    )
    return (
        bb.join(idx_lists, ["band", "key"])
        .select("batch_id", F.explode("__ids").alias("corpus_id"))
        .distinct()
    )
