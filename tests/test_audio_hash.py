"""Acoustic fingerprinting (operators/audio_hash.py): determinism,
gain invariance, noise robustness, discrimination, too-short guard,
Spark pairing through the shared banded plan."""

from __future__ import annotations

import numpy as np

from accounting_etl_spark.operators import media_codec as mc
from accounting_etl_spark.operators.audio_hash import (
    audio_fingerprints,
    audio_fp64,
    near_dup_audio_pairs,
)


def _tone(freqs, n=8000, rate=8000, amp=8000, seed=None):
    t = np.arange(n) / rate
    x = sum(np.sin(2 * np.pi * f * t) * amp for f in freqs)
    if seed is not None:
        x = x + np.random.default_rng(seed).normal(0, amp / 50, n)
    return np.clip(x, -32768, 32767).astype(np.int16)


def _ham(a, b):
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_fp_deterministic_and_gain_invariant():
    clip = _tone([440, 1200])
    fp = audio_fp64(clip, 8000)
    assert fp == audio_fp64(clip.copy(), 8000)
    # uniform gain scales every band energy equally: delta signs hold
    half = (clip.astype(np.int32) // 2).astype(np.int16)
    assert audio_fp64(half, 8000) == fp
    # stereo mix of the same signal
    stereo = np.stack([clip, clip], axis=1)
    assert audio_fp64(stereo, 8000) == fp


def test_fp_robust_to_light_noise():
    clean = _tone([440, 1200])
    noisy = _tone([440, 1200], seed=3)
    assert _ham(audio_fp64(clean, 8000), audio_fp64(noisy, 8000)) <= 6


def test_fp_discriminates_different_content():
    a = audio_fp64(_tone([440]), 8000)
    b = audio_fp64(_tone([2900]), 8000)
    rng = np.random.default_rng(9)
    c = audio_fp64(
        rng.integers(-20000, 20000, 8000).astype(np.int16), 8000
    )
    assert _ham(a, b) > 8 and _ham(a, c) > 8


def test_fp_too_short_returns_none():
    assert audio_fp64(np.zeros(10, np.int16), 8000) is None


def test_spark_pairs_identical_clips(spark):
    clip = _tone([440, 1200])
    other = _tone([2900])
    rows = [
        (1, bytearray(mc.encode_wav(clip, 8000))),
        (2, bytearray(mc.encode_wav(clip, 8000))),   # exact dup
        (3, bytearray(mc.encode_wav(other, 8000))),
        (4, bytearray(b"not a wav payload")),        # NULL fp
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, content binary")
    fps = audio_fingerprints(df)
    got = {r.doc_id: r.fp for r in fps.collect()}
    assert got[1] == got[2] is not None and got[4] is None
    pairs = near_dup_audio_pairs(fps).collect()
    assert {(r.id_a, r.id_b, r.hamming) for r in pairs} == {(1, 2, 0)}


def test_truncated_riff_nulls_not_batch_kill(spark):
    """ADVICE r6 (medium): a truncated RIFF/WAVE payload raises
    EOFError inside the codec — the fingerprint UDF must NULL that
    row, not kill the Arrow batch."""
    clip = _tone([440])
    wav = mc.encode_wav(clip, 8000)
    rows = [
        (1, bytearray(wav)),
        (2, bytearray(wav[:30])),  # truncated mid-header
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, content binary")
    got = {r.doc_id: r.fp for r in audio_fingerprints(df).collect()}
    assert got[1] is not None and got[2] is None


def test_bands_partition_spectrum():
    """ADVICE r6 (low): the log-spaced bands must PARTITION the
    spectrum bins — no one-bin overlap between adjacent bands. A tone
    whose energy sits in one FFT bin must light exactly one band, so
    nudging the tone across a band edge flips exactly the bits that
    depend on that band, never two bands at once. Structural check:
    recompute the edge layout the operator uses and assert
    disjointness + full coverage."""
    m = 8000 // 9 // 2  # bins per frame after DC drop, as in audio_fp64
    edges = np.unique(np.geomspace(1, m, 8 + 1).astype(int))
    edges[0] = 0
    while edges.size < 9:
        edges = np.unique(np.append(edges, edges[-1] + 1))
    spans = [(edges[b], edges[b + 1]) for b in range(8)]
    covered = []
    for lo, hi in spans:
        assert lo < hi
        covered.extend(range(lo, hi))
    assert covered == sorted(set(covered))  # disjoint
    assert covered[0] == 0 and covered[-1] == edges[-1] - 1  # contiguous
