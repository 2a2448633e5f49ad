"""Perceptual image hashing (operators/image_hash.py): encode
invariance, compression robustness, discrimination, brute-force
recall of the banded near-dup pairs, NULL-hash handling, plan shape."""

from __future__ import annotations

import numpy as np
import pytest

from accounting_etl_spark.operators import media_codec as mc
from accounting_etl_spark.operators.image_hash import (
    ahash64,
    dhash64,
    image_hashes,
    near_dup_image_pairs,
)


def _img(h=32, w=48, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def _smooth(h=32, w=48):
    y, x = np.mgrid[0:h, 0:w]
    g = (x * 255 // (w - 1) + y * 128 // (h - 1)) % 256
    return np.stack([g, 255 - g, g // 2], axis=-1).astype(np.uint8)


def _ham(a, b):
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_hash_invariant_across_lossless_encodes():
    img = _smooth()
    d0 = dhash64(img)
    for enc in (mc.encode_bmp, mc.encode_ppm, mc.encode_png):
        assert dhash64(mc.decode_image(enc(img))) == d0
        assert ahash64(mc.decode_image(enc(img))) == ahash64(img)


def test_hash_robust_to_jpeg_and_resize():
    from accounting_etl_spark.operators import jpeg_codec as jc

    img = _smooth()
    d0 = dhash64(img)
    jp = mc.decode_image(jc.encode_jpeg(img, quality=92))
    assert _ham(d0, dhash64(jp)) <= 6  # compression barely moves it
    # 2x upscale: the 9x8 reduction sees the same structure
    big = mc.resize_nearest(img, 96, 64)
    assert _ham(d0, dhash64(big)) <= 6


def test_hash_discriminates_unrelated_images():
    a, b = dhash64(_img(seed=1)), dhash64(_img(seed=2))
    assert _ham(a, b) > 10  # random bits: expected ~32


def test_pairs_match_brute_force(spark):
    """Banded candidate generation finds EVERY pair within Hamming
    chunks-1 (pigeonhole guarantee) — brute-force differential on a
    planted hash population."""
    rng = np.random.default_rng(7)
    hashes = []
    base = int(rng.integers(0, 1 << 63))
    for i in range(40):
        if i % 4 == 0:  # planted near-dup cluster around base
            h = base
            for b in rng.choice(64, size=i % 3, replace=False):
                h ^= 1 << int(b)
        else:
            h = int(rng.integers(0, 1 << 63))
        hashes.append((i, h - (1 << 64) if h >= 1 << 63 else h))
    df = spark.createDataFrame(hashes, "doc_id bigint, dhash bigint")
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in near_dup_image_pairs(df, max_hamming=3).collect()
    }
    want = {}
    for i in range(40):
        for j in range(i + 1, 40):
            d = _ham(hashes[i][1], hashes[j][1])
            if d <= 3:
                want[(i, j)] = d
    assert got == want and want  # non-trivial: planted pairs exist


def test_image_hashes_null_on_undecodable(spark):
    rows = [
        (1, bytearray(mc.encode_bmp(_smooth()))),
        (2, bytearray(b"\x00not an image")),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, content binary")
    got = {r.doc_id: r.dhash for r in image_hashes(df).collect()}
    assert got[1] is not None and got[2] is None
    # NULL hashes never reach pairing
    assert (
        near_dup_image_pairs(image_hashes(df), max_hamming=64).count() == 0
    )


def test_identical_payloads_pair_at_zero(spark):
    img = _smooth()
    rows = [
        (1, bytearray(mc.encode_bmp(img))),
        (2, bytearray(mc.encode_png(img))),  # different container!
        (3, bytearray(mc.encode_bmp(_img(seed=9)))),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, content binary")
    pairs = near_dup_image_pairs(image_hashes(df)).collect()
    assert {(r.id_a, r.id_b, r.hamming) for r in pairs} == {(1, 2, 0)}


def test_plan_has_no_join_stage(spark):
    df = spark.createDataFrame(
        [(i, i * 7) for i in range(8)], "doc_id bigint, dhash bigint"
    )
    plan = (
        near_dup_image_pairs(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for bad in ("CartesianProduct", "SortMergeJoin", "ShuffledHashJoin",
                "BroadcastNestedLoopJoin"):
        assert bad not in plan


def test_bad_chunks_raise(spark):
    df = spark.createDataFrame([(1, 2)], "doc_id bigint, dhash bigint")
    with pytest.raises(ValueError):
        near_dup_image_pairs(df, chunks=5)


def test_video_fp_majority_and_robustness(spark):
    from accounting_etl_spark.operators.image_hash import (
        video_fingerprints,
        video_fp64,
    )

    def grad_frames(n, cx=9, cy=5):
        y, x = np.mgrid[0:16, 0:20]
        return [
            np.stack(
                [(x * cx + y * cy + 11 * i) % 256] * 3, axis=-1
            ).astype(np.uint8)
            for i in range(n)
        ]

    frames = grad_frames(12)
    fp = video_fp64(frames)
    # container-independent: same frames through AVI-MJPEG (lossy but
    # smooth) vs MP4-MJPEG vs BMPS land within small Hamming distance
    payloads = [
        mc.encode_bmps(frames, fps=6),
        mc.encode_avi_mjpeg(frames, fps=6, quality=92),
        mc.encode_mp4_mjpeg(frames, fps=6, quality=92),
    ]
    rows = [(i, bytearray(p)) for i, p in enumerate(payloads)]
    rows.append((9, bytearray(b"not a video")))
    df = spark.createDataFrame(rows, "doc_id bigint, content binary")
    got = {r.doc_id: r.fp for r in video_fingerprints(df).collect()}
    assert got[0] == fp and got[9] is None
    for i in (1, 2):
        assert _ham(got[0], got[i]) <= 6
    # frame-rate halving (every other frame) keeps the majority bits
    assert _ham(fp, video_fp64(frames[::2])) <= 6
    # structurally different content (reversed gradient) is far —
    # note dHash is brightness-invariant BY DESIGN, so a mere
    # constant shift would (correctly) hash identically
    assert _ham(fp, video_fp64(grad_frames(12, cx=-9, cy=-5))) > 8
    with pytest.raises(ValueError):
        video_fp64([])
