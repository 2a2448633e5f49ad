"""Pin the vectorized _token_plane (r11 optimization) against the
original per-bigram loop: winner = max priority per pixel, FIRST
bigram on priority ties (`p > pr[pos]` never replaced an equal p).
The render shims for the image/audio/video dedup variants all derive
from this plane, so a selection drift would silently change every
rows-only multimodal fingerprint."""

from __future__ import annotations

import zlib

import numpy as np

from accounting_etl_spark.queries.multimodal import _token_plane


def _reference_plane(text: str) -> np.ndarray:
    toks = str(text).split()
    pr = np.full(72, -1, np.int64)
    val = np.zeros((72, 3), np.uint8)
    for i in range(len(toks) - 1):
        h = zlib.crc32(f"{toks[i]} {toks[i + 1]}".encode("utf-8"))
        pos = h % 72
        p = np.int64((h * 0x9E3779B1) & 0x7FFFFFFF)
        if p > pr[pos]:
            pr[pos] = p
            val[pos] = ((h >> 8) & 255, (h >> 16) & 255, (h >> 24) & 255)
    return val.reshape(8, 9, 3)


def test_matches_reference_on_edge_cases():
    cases = [
        "",
        "one",
        "a b",
        "a a a a a a",  # identical bigrams: tie on every claim
        "x y x y x y z",  # repeated bigrams + one unique
        " ".join(f"w{i % 7}" for i in range(500)),  # heavy collisions
        "unicode éé tøkens mixed 123 456",
    ]
    for text in cases:
        assert (_token_plane(text) == _reference_plane(text)).all(), text


def test_matches_reference_on_random_corpora():
    rng = np.random.default_rng(7)
    vocab = [f"tok{i}" for i in range(40)]
    for _ in range(50):
        n = int(rng.integers(0, 300))
        text = " ".join(vocab[int(i)] for i in rng.integers(0, 40, n))
        assert (_token_plane(text) == _reference_plane(text)).all()
