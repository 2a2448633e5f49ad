"""Incremental dedup — new batches against a stored corpus index.

A pipeline that continuously ingests data cannot re-shingle 100 TB of
already-curated corpus for every new batch. The scale shape is an
*index*: a small-per-doc state table persisted once and joined by each
batch —

- exact: ``(content_hash, keep_id)``, one row per distinct normalized
  content (:func:`exact_hash_index`);
- near-dup: the MinHash band-key table ``(doc_id, band, key)``
  (:func:`~.dedup.minhash_bands`), ``bands`` rows per doc;
- perceptual: one row per DISTINCT 64-bit signature
  (:func:`hamming_signature_index` — the identical-signature collapse
  made durable; blank-thumbnail mass is a single row).

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


def hamming_signature_index(
    hashes: DataFrame, *, id_col: str = "doc_id", hash_col: str = "dhash"
) -> DataFrame:
    """The persistable perceptual-dedup corpus state: one row per
    DISTINCT 64-bit signature — ``(sig, rep_id, n_members)``.

    This is the identical-signature collapse (operators/image_hash.py)
    made durable: the index never stores the degenerate mass (10⁷
    blank thumbnails are ONE row), rep_id is the published survivor,
    and n_members keeps the dataset-card accounting. Persist this
    instead of re-hashing the corpus per batch."""
    return (
        hashes.where(F.col(hash_col).isNotNull())
        .groupBy(F.col(hash_col).alias("sig"))
        .agg(
            F.min(id_col).alias("rep_id"),
            F.count(F.lit(1)).cast("bigint").alias("n_members"),
        )
    )


def hamming_against_index(
    batch_hashes: DataFrame,
    sig_index: DataFrame,
    *,
    id_col: str = "doc_id",
    hash_col: str = "dhash",
    max_hamming: int = 3,
    chunks: int = 4,
    max_posting: int = 100_000,
) -> DataFrame:
    """Near-dup links ``(batch_id, corpus_rep, hamming)`` between a
    new batch's perceptual signatures and an indexed corpus — the
    incremental twin of :func:`~.image_hash.hamming_banded_pairs`.

    Exact-signature hits short-circuit through ONE equi-join on the
    signature itself (hamming 0 — the degenerate blank mass lands
    here and meets exactly one index row). Near hits band both sides
    into ``chunks`` 16-bit chunks and equi-join on (chunk, val); the
    corpus side carries only DISTINCT signatures, its posting lists
    are capped at ``max_posting`` min-rep entries per band (the same
    deterministic hot-band policy as the self-join pairing), and the
    verify is one codegen ``bit_count(xor) BETWEEN 1 AND max_hamming``
    (0 excluded — already matched exactly). The corpus is never
    re-hashed; shuffles touch band keys only."""
    if not 1 <= chunks <= 64 or 64 % chunks:
        raise ValueError("chunks must divide 64")
    if max_hamming > chunks - 1:
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the pigeonhole guarantee "
            f"of chunks={chunks}; raise chunks"
        )
    width = 64 // chunks
    mask = (1 << width) - 1
    bsig = batch_hashes.where(F.col(hash_col).isNotNull()).select(
        F.col(id_col).alias("batch_id"), F.col(hash_col).alias("__bh")
    )
    exact = bsig.join(
        sig_index, bsig["__bh"] == sig_index["sig"]
    ).select(
        "batch_id",
        F.col("rep_id").alias("corpus_rep"),
        F.lit(0).cast("int").alias("hamming"),
    )

    def chunked(df: DataFrame, col: str, out: str) -> DataFrame:
        return df.select(
            "*",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("chunk"),
                            F.shiftrightunsigned(F.col(col), c * width)
                            .bitwiseAND(F.lit(mask))
                            .alias("val"),
                        )
                        for c in range(chunks)
                    ]
                )
            ).alias(out),
        ).select("*", f"{out}.chunk", f"{out}.val").drop(out)

    bb = chunked(bsig, "__bh", "__cv")
    idx_lists = (
        chunked(sig_index.select("sig", "rep_id"), "sig", "__cv")
        .groupBy("chunk", "val")
        .agg(
            F.slice(
                F.sort_array(
                    F.collect_set(F.struct("rep_id", "sig"))
                ),
                1,
                max_posting,
            ).alias("__xs")
        )
    )
    near = (
        bb.join(idx_lists, ["chunk", "val"])
        .select(
            "batch_id",
            "__bh",
            F.explode("__xs").alias("__x"),
        )
        .select(
            "batch_id",
            F.col("__x.rep_id").alias("corpus_rep"),
            F.bit_count(F.col("__bh").bitwiseXOR(F.col("__x.sig")))
            .cast("int")
            .alias("hamming"),
        )
        .filter(F.col("hamming").between(1, max_hamming))
        .groupBy("batch_id", "corpus_rep")
        .agg(F.first("hamming").alias("hamming"))
    )
    return exact.unionByName(near)


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
