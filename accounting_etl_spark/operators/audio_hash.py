"""Acoustic fingerprinting + near-duplicate audio dedup.

The audio member of the multimodal dedup triple (text SimHash, image
dHash, this): a compact spectral signature in the Haitsma–Kalker
(2002) style — the sign of the energy DELTA across adjacent
time-frame × frequency-band cells. Re-encoded, gain-shifted, or
lightly-noised copies of the same recording keep the same delta
signs, so dedup reduces to the shared Hamming-banded posting-list
machinery (operators/image_hash.py::hamming_banded_pairs — itself
the SimHash plan).

Signature layout: the PCM stream (mono mix) splits into 9 equal
time frames; each frame's magnitude spectrum (numpy rfft) folds
into 8 log-spaced bands; bit(t, b) = E(t+1, b) > E(t, b) over the
8×8 delta grid → one 64-bit fingerprint per clip.

Scale shape: ONE Arrow ``mapInPandas`` pass decodes WAV payloads and
emits (id, fp) — samples never leave the executor, undecodable rows
yield NULL. Everything downstream is the JVM-side banded pairing.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
from pyspark.sql import DataFrame

_FRAMES = 9  # -> 8 deltas
_BANDS = 8


def audio_fp64(samples: np.ndarray, rate: int) -> int | None:
    """64-bit spectral-delta fingerprint of an int16 PCM clip
    (shape [n] or [n, ch]; channels mix to mono). None when the clip
    is too short to frame."""
    if samples.ndim == 2:
        samples = samples.mean(axis=1)
    x = samples.astype(np.float64)
    n = x.size - (x.size % _FRAMES)
    if n < _FRAMES * 2 * _BANDS:
        return None
    frames = x[:n].reshape(_FRAMES, -1)
    mags = np.abs(np.fft.rfft(frames, axis=1))[:, 1:]  # drop DC
    # log-spaced band edges over the positive spectrum; half-open
    # [edges[b], edges[b+1]) slices PARTITION the bins — no overlap
    m = mags.shape[1]
    edges = np.unique(
        np.geomspace(1, m, _BANDS + 1).astype(int)
    )
    edges[0] = 0  # first band starts at the spectrum origin
    while edges.size < _BANDS + 1:  # tiny spectra: pad linearly
        edges = np.unique(np.append(edges, edges[-1] + 1))
    e = np.stack(
        [
            (mags[:, edges[b] : edges[b + 1]] ** 2).sum(axis=1)
            for b in range(_BANDS)
        ],
        axis=1,
    )  # [frames, bands] energies
    bits = (e[1:] > e[:-1]).reshape(-1)  # 8x8 delta signs
    out = 0
    for i, b in enumerate(bits):
        if b:
            out |= 1 << i
    return out - (1 << 64) if out >= 1 << 63 else out


def audio_fingerprints(
    df: DataFrame, *, id_col: str = "doc_id", content_col: str = "content"
) -> DataFrame:
    """(id, fp) per row — one Arrow pass over WAV payload bytes;
    non-WAV or too-short payloads get NULL fingerprints."""
    import pandas as pd

    def _fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .media_codec import decode_wav

        for pdf in batches:
            rows = []
            for rid, content in zip(pdf[id_col], pdf[content_col]):
                fp = None
                try:
                    wav = decode_wav(bytes(content))
                except Exception:
                    # truncated RIFF raises EOFError/struct.error —
                    # NULL the row instead of killing the Arrow batch
                    wav = None
                if wav is not None:
                    fp = audio_fp64(*wav)
                rows.append((int(rid), fp))
            yield pd.DataFrame(rows, columns=[id_col, "fp"]).astype(
                {"fp": "Int64"}
            )

    return df.select(id_col, content_col).mapInPandas(
        _fp, schema=f"{id_col} bigint, fp bigint"
    )


def near_dup_audio_pairs(
    fps: DataFrame,
    *,
    id_col: str = "doc_id",
    max_hamming: int = 3,
    chunks: int = 4,
    max_bucket: int = 256,
    max_posting: int | None = 100_000,
) -> DataFrame:
    """Near-dup audio pairs (id_a, id_b, hamming) — the shared
    Hamming-banded posting-list pairing over the fingerprint
    (identical-fingerprint collapse + hot-band cap included; silent
    clips are the audio face of the degenerate-signature mass)."""
    from .image_hash import hamming_banded_pairs

    return hamming_banded_pairs(
        fps,
        id_col=id_col,
        hash_col="fp",
        max_hamming=max_hamming,
        chunks=chunks,
        max_bucket=max_bucket,
        max_posting=max_posting,
    )
