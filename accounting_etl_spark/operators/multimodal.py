"""Multimodal columns: opaque binary payloads + typed metadata.

The reference's precedent is the PDF pipeline: attachment bytes as
an opaque payload, metadata and extracted features alongside
(email_fetcher.py:93-94 → BinaryType; SURVEY §1.3). Generalized:
image/audio/video ride as ``binary`` columns; decode / feature
extraction runs in Arrow-batched ``mapInPandas`` so payload bytes
never leave the executor.

The actual codecs are NOT in this container, so ``real_decode=True``
raises ``NotImplementedError`` at the decode site; the default path
produces a deterministic fake feature set (derived from the payload
md5) with the REAL Spark plumbing: output schema, batch iteration,
and partition behavior are exactly what a libjpeg/ffmpeg-backed
version would use.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_FEATURE_SCHEMA = (
    "doc_id bigint, modality string, n_bytes bigint, checksum string, "
    "width int, height int, n_frames int, sample_rate int"
)


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Fake a binary media column from text (test-data shim): payload
    bytes + modality tag. Real pipelines land payloads via
    ``spark.read.format('binaryFile')`` (sources/binary_files.py)."""
    return df.withColumn("content", F.encode(F.col(text_col), "UTF-8")).withColumn(
        "modality",
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ),
    )


def extract_media_features(
    df: DataFrame, *, real_decode: bool = False
) -> DataFrame:
    """binary content → per-item feature row, Arrow-batched.

    Expects columns (doc_id, modality, content:binary). The fake
    decoder derives width/height/frames/sample_rate deterministically
    from the payload checksum so tests are stable.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real_decode:
                raise NotImplementedError(
                    "media codecs (PIL/ffmpeg) are not available in this "
                    "container; run with real_decode=False for the "
                    "deterministic fake decode"
                )
            out = []
            for doc_id, modality, content in zip(
                pdf["doc_id"], pdf["modality"], pdf["content"]
            ):
                payload = bytes(content)
                digest = hashlib.md5(payload).hexdigest()
                seed = int(digest[:8], 16)
                out.append(
                    {
                        "doc_id": int(doc_id),
                        "modality": modality,
                        "n_bytes": len(payload),
                        "checksum": digest,
                        "width": 16 + seed % 4080 if modality in ("image", "video") else None,
                        "height": 16 + (seed >> 12) % 2144 if modality in ("image", "video") else None,
                        "n_frames": 1 + (seed >> 4) % 7200 if modality == "video" else (1 if modality == "image" else None),
                        "sample_rate": 8000 + (seed % 6) * 8000 if modality == "audio" else None,
                    }
                )
            yield pd.DataFrame(out)

    cols = df.select("doc_id", "modality", "content")
    return cols.mapInPandas(_decode, schema=MEDIA_FEATURE_SCHEMA)


FRAME_SAMPLE_SCHEMA = "doc_id bigint, frame_idx int, ts_ms bigint, frame binary"

RESIZE_SCHEMA = (
    "doc_id bigint, width int, height int, content binary"
)


def sample_frames(
    df: DataFrame,
    *,
    every_n: int = 30,
    max_frames: int = 8,
    real_decode: bool = False,
) -> DataFrame:
    """Video payloads → one row per sampled frame (1→N fan-out).

    Real plumbing for the ffmpeg-backed version: rows fan out inside
    the Arrow batch (a frame row per every_n-th frame, capped), frame
    bytes stay executor-side as ``binary``, timestamps are exact
    integer milliseconds. The fake decoder derives a deterministic
    frame count from the checksum and slices payload bytes as fake
    frames; ``real_decode=True`` raises until codecs exist.
    """

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real_decode:
                raise NotImplementedError(
                    "video codecs (ffmpeg) are not available in this "
                    "container; run with real_decode=False"
                )
            out = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                payload = bytes(content)
                seed = int(hashlib.md5(payload).hexdigest()[:8], 16)
                n_frames = 1 + (seed >> 4) % 7200
                fps = 30
                taken = 0
                for idx in range(0, n_frames, every_n):
                    if taken >= max_frames:
                        break
                    lo = idx % max(1, len(payload) - 16)
                    out.append(
                        {
                            "doc_id": int(doc_id),
                            "frame_idx": idx,
                            "ts_ms": idx * 1000 // fps,
                            "frame": payload[lo : lo + 16],
                        }
                    )
                    taken += 1
            yield pd.DataFrame(
                out, columns=["doc_id", "frame_idx", "ts_ms", "frame"]
            )

    vids = df.filter(F.col("modality") == "video").select("doc_id", "content")
    return vids.mapInPandas(_sample, schema=FRAME_SAMPLE_SCHEMA)


def resize_images(
    df: DataFrame,
    *,
    width: int = 224,
    height: int = 224,
    real_decode: bool = False,
) -> DataFrame:
    """Image payloads → fixed-size payloads (binary→binary map).

    The PIL-backed version would decode, resize, re-encode; the fake
    keeps the plumbing honest — output bytes are a deterministic
    function of (payload, width, height) with the declared target
    dimensions in typed columns.
    """

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real_decode:
                raise NotImplementedError(
                    "image codecs (PIL) are not available in this "
                    "container; run with real_decode=False"
                )
            out = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                payload = bytes(content)
                fake = hashlib.md5(
                    payload + f"{width}x{height}".encode()
                ).digest()
                out.append(
                    {
                        "doc_id": int(doc_id),
                        "width": width,
                        "height": height,
                        "content": fake,
                    }
                )
            yield pd.DataFrame(
                out, columns=["doc_id", "width", "height", "content"]
            )

    imgs = df.filter(F.col("modality") == "image").select("doc_id", "content")
    return imgs.mapInPandas(_resize, schema=RESIZE_SCHEMA)
