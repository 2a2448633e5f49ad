"""Perceptual image hashing + near-duplicate image dedup.

The image-side twin of the text near-dup stack: re-encoded, resized,
or slightly-recompressed copies of the same picture (the dominant
duplication mode in crawled image corpora) hash to equal or
near-equal 64-bit perceptual signatures, so dedup reduces to the
SAME Hamming-banded posting-list machinery SimHash uses
(operators/dedup.py — pigeonhole banding, chunk-pair rows,
``bit_count(xor)`` verify).

Hashes (both classic, e.g. the pHash/dHash family described in the
imagehash literature):

- **dHash** (difference hash): grayscale → 9×8 nearest resize → each
  bit is "left pixel < right pixel" per row. Robust to global
  brightness/contrast shifts and mild compression noise.
- **aHash** (average hash): 8×8 grayscale, bit = pixel ≥ mean.

Scale shape: ONE Arrow ``mapInPandas`` pass decodes payload bytes
through the built-in codecs and emits (id, dhash, ahash) — bytes
never leave the executor, undecodable payloads yield NULL hashes and
drop out of pairing. Everything after the hash column is JVM-side:
banding is an in-row explode, posting lists bound per-row memory via
the chunk-pair expansion, and the Hamming verify is
``bit_count(xor)`` in codegen. Guarantee: with 4 × 16-bit bands any
pair within Hamming distance 3 shares at least one exact band.

Degenerate signature mass (blank thumbnails, silent clips — the
dominant junk in crawled corpora — hash IDENTICALLY while differing
in bytes) is bounded twice: identical signatures collapse to one
representative before banding (star pairs, linear output), and
over-populated bands are skipped at a documented cap (see
``hamming_banded_pairs`` / ``hot_band_audit``).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.checkpointing import stable_checkpoint
from ..functions.pairs import explode_bucket_pairs

# integer ITU-R BT.601 luma milli-weights
_LUMA = (299, 587, 114)


def _gray(img: np.ndarray) -> np.ndarray:
    r, g, b = (img[:, :, i].astype(np.uint32) for i in range(3))
    return ((r * _LUMA[0] + g * _LUMA[1] + b * _LUMA[2]) // 1000).astype(
        np.uint8
    )


def dhash64(img: np.ndarray) -> int:
    """64-bit difference hash of a uint8[H,W,3] RGB image."""
    from .media_codec import resize_nearest

    g = _gray(resize_nearest(img, 9, 8))
    bits = (g[:, :-1] < g[:, 1:]).reshape(-1)
    out = 0
    for i, b in enumerate(bits):
        if b:
            out |= 1 << i
    return out - (1 << 64) if out >= 1 << 63 else out  # signed int64


def ahash64(img: np.ndarray) -> int:
    """64-bit average hash of a uint8[H,W,3] RGB image."""
    from .media_codec import resize_nearest

    g = _gray(resize_nearest(img, 8, 8))
    bits = (g >= g.mean()).reshape(-1)
    out = 0
    for i, b in enumerate(bits):
        if b:
            out |= 1 << i
    return out - (1 << 64) if out >= 1 << 63 else out


def image_hashes(
    df: DataFrame, *, id_col: str = "doc_id", content_col: str = "content"
) -> DataFrame:
    """(id, dhash, ahash) per row — one Arrow pass, payload bytes
    stay on the executor; undecodable/unrecognized payloads get NULL
    hashes (callers drop or audit them)."""
    import pandas as pd

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from . import media_codec as mc

        for pdf in batches:
            rows = []
            for rid, content in zip(pdf[id_col], pdf[content_col]):
                d = a = None
                try:
                    img = mc.decode_image(bytes(content))
                except Exception:
                    # corrupt-but-recognized payloads raise whatever
                    # the codec hit (zlib.error, struct.error, ...);
                    # one bad row must NULL out, not kill the batch
                    img = None
                if img is not None:
                    d, a = dhash64(img), ahash64(img)
                rows.append((int(rid), d, a))
            yield pd.DataFrame(
                rows, columns=[id_col, "dhash", "ahash"]
            ).astype({"dhash": "Int64", "ahash": "Int64"})

    return df.select(id_col, content_col).mapInPandas(
        _hash, schema=f"{id_col} bigint, dhash bigint, ahash bigint"
    )


def hamming_banded_pairs(
    hashes: DataFrame,
    *,
    id_col: str = "doc_id",
    hash_col: str = "dhash",
    max_hamming: int = 3,
    chunks: int = 4,
    max_bucket: int = 256,
    max_posting: int | None = 100_000,
) -> DataFrame:
    """Near-dup pairs (id_a, id_b, hamming) with distance <=
    ``max_hamming`` over ANY 64-bit signature column (perceptual
    image hash here, acoustic fingerprint in audio_hash.py, SimHash
    in dedup.py) — the pigeonhole-banded posting-list plan: any pair
    within distance chunks-1 shares an exact 16-bit chunk, pair
    expansion is chunk-pair rows (O(max_bucket²) per row), the
    verify is one codegen ``bit_count(xor)``.

    Degenerate-mass bounds (VERDICT r6 #1 — blank thumbnails / silent
    clips hash IDENTICALLY while differing in bytes, so exact payload
    dedup upstream does not remove them):

    - **Identical-signature collapse**: equal signatures fold to the
      min-id representative BEFORE banding. A group of n equal
      signatures is trivially all-dups at distance 0 — it emits the
      n-1 STAR pairs (rep, member, 0) instead of all n(n-1)/2, and
      only the rep enters the banding. Pair output is linear in group
      size; connected components over the output equal those over the
      full pair set (members reach each other through the rep, and
      cross-group distance is a signature property, carried by reps).
    - **Hot-band cap** (``max_posting``): bands whose DISTINCT-
      signature posting list exceeds the cap are skipped — a band
      value shared by that many distinct signatures carries no
      discriminative signal, only O(posting²) cost. Deterministic
      (skip, never sample); audit what a corpus would drop with
      :func:`hot_band_audit` before raising/lowering it. ``None``
      disables the cap.

    The (id, signature) projection is checkpointed so the upstream
    pipeline (decode UDF / signature fold) runs ONCE across the
    star-pair and banded branches — 16 bytes/row, negligible at any
    scale.
    """
    if not 1 <= chunks <= 64 or 64 % chunks:
        raise ValueError("chunks must divide 64")
    if max_hamming > chunks - 1:
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the pigeonhole guarantee "
            f"of chunks={chunks} (pairs at distance > chunks-1 need not "
            "share any band); raise chunks"
        )
    width = 64 // chunks
    mask = (1 << width) - 1
    sig = stable_checkpoint(
        hashes.where(F.col(hash_col).isNotNull()).select(
            F.col(id_col).alias("__id"), F.col(hash_col).alias("__h")
        )
    )
    marked = sig.select(
        "__id",
        "__h",
        F.min("__id").over(Window.partitionBy("__h")).alias("__rep"),
    )
    zero = marked.where(F.col("__id") != F.col("__rep")).select(
        F.col("__rep").alias("id_a"),
        F.col("__id").alias("id_b"),
        F.lit(0).cast("int").alias("hamming"),
    )
    reps = marked.where(F.col("__id") == F.col("__rep")).select(
        "__id", "__h"
    )
    chunked = reps.select(
        "__id",
        "__h",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftrightunsigned(F.col("__h"), c * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("val"),
                    )
                    for c in range(chunks)
                ]
            )
        ).alias("cv"),
    ).select("__id", "__h", "cv.chunk", "cv.val")
    postings = (
        chunked.groupBy("chunk", "val")
        .agg(
            F.sort_array(F.collect_set(F.struct("__id", "__h"))).alias("xs")
        )
        .filter(F.size("xs") >= 2)
    )
    if max_posting is not None:
        postings = postings.filter(F.size("xs") <= max_posting)
    cross = (
        explode_bucket_pairs(
            postings,
            "xs",
            lambda x, y: F.struct(
                x["__id"].alias("id_a"),
                y["__id"].alias("id_b"),
                F.bit_count(x["__h"].bitwiseXOR(y["__h"]))
                .cast("int")
                .alias("hamming"),
            ),
            max_bucket,
        )
        .filter(F.col("p.hamming") <= max_hamming)
        .groupBy(
            F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b")
        )
        .agg(F.first("p.hamming").alias("hamming"))
    )
    # distinct reps have hamming >= 1, star pairs are exactly 0: the
    # union is disjoint by construction, no dedup needed across it
    return zero.unionByName(cross)


def hot_band_audit(
    hashes: DataFrame,
    *,
    id_col: str = "doc_id",
    hash_col: str = "dhash",
    chunks: int = 4,
    max_posting: int = 100_000,
) -> DataFrame:
    """The bands :func:`hamming_banded_pairs` would SKIP at this cap:
    (chunk, val, n_sigs) for every band whose distinct-signature
    posting list exceeds ``max_posting``. Output is bounded by the
    over-cap band count (tiny) — collect and log it so a pipeline
    records exactly what discriminative signal the cap traded away."""
    if not 1 <= chunks <= 64 or 64 % chunks:
        raise ValueError("chunks must divide 64")
    width = 64 // chunks
    mask = (1 << width) - 1
    sigs = (
        hashes.where(F.col(hash_col).isNotNull())
        .select(F.col(hash_col).alias("__h"))
        .distinct()
    )
    chunked = sigs.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftrightunsigned(F.col("__h"), c * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("val"),
                    )
                    for c in range(chunks)
                ]
            )
        ).alias("cv")
    ).select("cv.chunk", "cv.val")
    return (
        chunked.groupBy("chunk", "val")
        .agg(F.count("*").cast("bigint").alias("n_sigs"))
        .filter(F.col("n_sigs") > max_posting)
    )


# image-named alias of the generic banded pairing
near_dup_image_pairs = hamming_banded_pairs


def video_fp64(frames: list[np.ndarray], *, max_frames: int = 16) -> int:
    """64-bit clip fingerprint: per-bit MAJORITY vote over the
    dHashes of up to ``max_frames`` evenly-sampled frames. Robust to
    re-encoding and frame-rate changes (the sampled content, not the
    container cadence, drives every bit); two clips sharing most
    footage land within small Hamming distance."""
    n = len(frames)
    if n == 0:
        raise ValueError("empty frame list")
    idx = sorted({int(i * n / min(n, max_frames)) for i in
                  range(min(n, max_frames))})
    votes = [0] * 64
    for i in idx:
        h = dhash64(frames[i]) & ((1 << 64) - 1)
        for b in range(64):
            votes[b] += (h >> b) & 1
    k = len(idx)
    out = 0
    for b in range(64):
        if 2 * votes[b] > k:  # strict majority; ties -> 0
            out |= 1 << b
    return out - (1 << 64) if out >= 1 << 63 else out


def video_fingerprints(
    df: DataFrame, *, id_col: str = "doc_id", content_col: str = "content"
) -> DataFrame:
    """(id, fp) per row over video payload bytes (BMPS/AVI/MP4/GIF
    via media_codec.decode_video) — one Arrow pass; undecodable or
    compressed-codec payloads get NULL fingerprints."""
    import pandas as pd

    def _fp(batches):
        from . import media_codec as mc

        for pdf in batches:
            rows = []
            for rid, content in zip(pdf[id_col], pdf[content_col]):
                fp = None
                try:
                    vid = mc.decode_video(bytes(content))
                except Exception:
                    # truncated sample tables etc. raise ValueError/
                    # struct.error — NULL the row, keep the batch
                    vid = None
                if vid is not None and vid[0]:
                    fp = video_fp64(vid[0])
                rows.append((int(rid), fp))
            yield pd.DataFrame(rows, columns=[id_col, "fp"]).astype(
                {"fp": "Int64"}
            )

    return df.select(id_col, content_col).mapInPandas(
        _fp, schema=f"{id_col} bigint, fp bigint"
    )
