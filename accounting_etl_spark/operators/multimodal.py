"""Multimodal columns: opaque binary payloads + typed metadata.

The reference's precedent is the PDF pipeline: attachment bytes as
an opaque payload, metadata and extracted features alongside
(email_fetcher.py:93-94 → BinaryType; SURVEY §1.3). Generalized:
image/audio/video ride as ``binary`` columns; decode / feature
extraction runs in Arrow-batched ``mapInPandas`` so payload bytes
never leave the executor.

``real_decode=True`` decodes REAL payloads: PIL/ffmpeg when
installed, else the pure-stdlib codecs in
:mod:`accounting_etl_spark.operators.media_codec` (24-bit BMP, binary
PPM, PNG, GIF, baseline JPEG, PCM WAV, AVI with MJPG/DIB
streams, animated GIF, the BMPS test container).
Payloads whose
magic matches no available codec raise ``NotImplementedError`` at the
decode site. The default (``real_decode=False``) keeps the
deterministic fake feature set (derived from the payload md5) for
oracle-stable tests; plumbing — output schema, batch iteration,
partition behavior — is identical on both paths.
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

    def _real_features(doc_id: int, payload: bytes) -> dict:
        from . import media_codec as mc

        digest = hashlib.md5(payload).hexdigest()
        base = {
            "doc_id": doc_id, "n_bytes": len(payload), "checksum": digest,
            "width": None, "height": None, "n_frames": None,
            "sample_rate": None,
        }
        try:
            # BMPS / AVI / MJPEG-in-MP4 / animated GIF
            vid = mc.decode_video(payload)
        except Exception:
            # recognized container, compressed codec (avc1 mp4,
            # cinepak AVI, …) raises NotImplementedError; CORRUPT
            # payloads raise whatever the codec hit (ValueError,
            # struct.error, …). Either way fall through to the
            # metadata probe — a feature row beats a dead batch
            vid = None
        if vid is not None:
            frames, _fps = vid
            h, w, _ = frames[0].shape
            return {**base, "modality": "video", "width": w, "height": h,
                    "n_frames": len(frames)}
        mp4 = mc.probe_mp4(payload)  # metadata-only: decode needs ffmpeg
        if mp4 is not None:
            return {**base, "modality": "video", "width": mp4["width"],
                    "height": mp4["height"], "n_frames": mp4["n_frames"]}
        try:
            img = mc.decode_image(payload)
        except Exception:
            # recognized-but-unsupported variant raises
            # NotImplementedError; corrupt streams raise zlib.error/
            # struct.error/... — both fall to the PIL/probe ladder
            img = None
        if img is None:
            try:  # PIL handles lossy-webp/exotic variants when installed
                import io

                from PIL import Image

                with Image.open(io.BytesIO(payload)) as im:
                    img_w, img_h = im.size
                return {**base, "modality": "image", "width": img_w,
                        "height": img_h, "n_frames": 1}
            except ImportError:
                pass
            except Exception:
                img = None
            # PIL absent or failed: lossy-webp dimensions are still a
            # pure header read (the mp4-probe pattern) — a metadata
            # row beats an unreadable payload
            from .webp_codec import probe_webp

            wp = probe_webp(payload)
            if wp is not None:
                return {**base, "modality": "image",
                        "width": wp["width"], "height": wp["height"],
                        "n_frames": 1}
        if img is not None:
            h, w, _ = img.shape
            return {**base, "modality": "image", "width": w, "height": h,
                    "n_frames": 1}
        try:
            aud = mc.decode_wav(payload)
        except Exception:  # truncated RIFF: EOFError/struct.error
            aud = None
        if aud is not None:
            samples, rate = aud
            return {**base, "modality": "audio", "sample_rate": rate,
                    "n_frames": len(samples)}
        raise NotImplementedError(
            f"NotImplementedError: no available media codec matches "
            f"payload magic {payload[:4]!r}; built-in codecs cover "
            f"BMP/PPM/PNG/GIF/JPEG/WAV/AVI/BMPS, others need PIL/ffmpeg"
        )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real_decode:
                yield pd.DataFrame(
                    [
                        _real_features(int(doc_id), bytes(content))
                        for doc_id, content in zip(
                            pdf["doc_id"], pdf["content"]
                        )
                    ],
                    columns=["doc_id", "modality", "n_bytes", "checksum",
                             "width", "height", "n_frames", "sample_rate"],
                )
                continue
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
    frames; ``real_decode=True`` decodes BMPS / AVI (MJPG, DIB) /
    animated-GIF payloads with the built-in codecs (other containers
    need ffmpeg).
    """

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from . import media_codec as mc

        for pdf in batches:
            if real_decode:
                out = []
                for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                    vid = mc.decode_video(bytes(content))
                    if vid is None:
                        raise NotImplementedError(
                            "NotImplementedError: real frame sampling "
                            "covers BMPS / AVI (MJPG, DIB) / animated "
                            "GIF; other video formats need ffmpeg"
                        )
                    frames, fps = vid
                    for taken, idx in enumerate(
                        range(0, len(frames), every_n)
                    ):
                        if taken >= max_frames:
                            break
                        out.append({
                            "doc_id": int(doc_id),
                            "frame_idx": idx,
                            "ts_ms": idx * 1000 // fps,
                            "frame": mc.encode_bmp(frames[idx]),
                        })
                yield pd.DataFrame(
                    out, columns=["doc_id", "frame_idx", "ts_ms", "frame"]
                )
                continue
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

    ``real_decode=True`` decodes BMP/PPM/PNG/GIF/JPEG/WebP-lossless
    with the built-in codecs,
    resamples nearest-neighbor in numpy, and re-encodes BMP (PIL would
    add jpeg/webp). The fake path keeps output bytes a deterministic
    function of (payload, width, height) with the declared target
    dimensions in typed columns.
    """

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from . import media_codec as mc

        for pdf in batches:
            if real_decode:
                out = []
                for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                    img = mc.decode_image(bytes(content))
                    if img is None:
                        raise NotImplementedError(
                            "NotImplementedError: real resize covers "
                            "BMP/PPM/PNG/GIF/JPEG/VP8L payloads; lossy "
                            "webp needs PIL"
                        )
                    small = mc.resize_nearest(img, width, height)
                    out.append({
                        "doc_id": int(doc_id), "width": width,
                        "height": height,
                        "content": mc.encode_bmp(small),
                    })
                yield pd.DataFrame(
                    out, columns=["doc_id", "width", "height", "content"]
                )
                continue
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


AUDIO_FEATURE_SCHEMA = (
    "doc_id bigint, sample_rate int, n_samples bigint, duration_ms bigint, "
    "rms double, peak double, zero_cross_rate double, "
    "spectral_centroid_hz double, dominant_freq_hz double"
)


def extract_audio_features(
    df: DataFrame, *, real_decode: bool = False
) -> DataFrame:
    """Audio payloads → signal-level features (the audio analog of
    image feature extraction): RMS/peak level, zero-crossing rate,
    FFT spectral centroid and dominant frequency — the standard cheap
    descriptors an audio-curation pass filters on (silence, clipping,
    tone-vs-speech) before any expensive model runs.

    ``real_decode=True`` decodes PCM WAV with the stdlib codec and
    computes the features in numpy over the Arrow batch (mono mixdown
    first); payload bytes never leave the executor, one map-side
    pass. The fake path derives deterministic pseudo-features from the
    payload md5 (schema/plumbing identical), same contract as
    :func:`extract_media_features`.
    """

    def _features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from . import media_codec as mc

        cols = ["doc_id", "sample_rate", "n_samples", "duration_ms",
                "rms", "peak", "zero_cross_rate", "spectral_centroid_hz",
                "dominant_freq_hz"]
        for pdf in batches:
            out = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                payload = bytes(content)
                if not real_decode:
                    seed = int(hashlib.md5(payload).hexdigest()[:8], 16)
                    rate = 8000 + (seed % 6) * 8000
                    n = 1 + seed % 480_000
                    out.append({
                        "doc_id": int(doc_id), "sample_rate": rate,
                        "n_samples": n,
                        "duration_ms": n * 1000 // rate,
                        "rms": (seed % 10_000) / 10_000.0,
                        "peak": (seed % 32_768) / 32_768.0,
                        "zero_cross_rate": (seed % 1000) / 1000.0,
                        "spectral_centroid_hz": float(seed % (rate // 2)),
                        "dominant_freq_hz": float(seed % (rate // 2)),
                    })
                    continue
                aud = mc.decode_wav(payload)
                if aud is None:
                    raise NotImplementedError(
                        "NotImplementedError: real audio features cover "
                        "PCM WAV; other containers need ffmpeg"
                    )
                samples, rate = aud
                mono = samples.astype(np.float64).mean(axis=1) / 32768.0
                n = len(mono)
                rms = float(np.sqrt(np.mean(mono**2))) if n else 0.0
                peak = float(np.max(np.abs(mono))) if n else 0.0
                zcr = (
                    float(np.mean(np.abs(np.diff(np.signbit(mono)))))
                    if n > 1 else 0.0
                )
                if n > 1:
                    mag = np.abs(np.fft.rfft(mono))
                    freqs = np.fft.rfftfreq(n, d=1.0 / rate)
                    total = float(mag.sum())
                    centroid = (
                        float((freqs * mag).sum() / total) if total else 0.0
                    )
                    dominant = float(freqs[int(np.argmax(mag[1:]) + 1)])
                else:
                    centroid = dominant = 0.0
                out.append({
                    "doc_id": int(doc_id), "sample_rate": int(rate),
                    "n_samples": n, "duration_ms": n * 1000 // int(rate),
                    "rms": rms, "peak": peak, "zero_cross_rate": zcr,
                    "spectral_centroid_hz": centroid,
                    "dominant_freq_hz": dominant,
                })
            yield pd.DataFrame(out, columns=cols)

    auds = df.filter(F.col("modality") == "audio").select("doc_id", "content")
    return auds.mapInPandas(_features, schema=AUDIO_FEATURE_SCHEMA)
