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


def _components(pairs, nodes):
    """Union-find closure over pair keys."""
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent[find(a)] = find(b)
    # canonical labels: min node id of each component
    mins = {}
    for n in nodes:
        r = find(n)
        mins[r] = min(mins.get(r, n), n)
    return {n: mins[find(n)] for n in nodes}


def test_pairs_match_brute_force(spark):
    """Banded candidate generation is SOUND (every emitted pair is a
    true <=3 pair with the correct distance) and CONNECTIVITY-COMPLETE
    vs brute force: identical signatures collapse to min-id star pairs
    (linear output), so per-pair equality holds up to the star — the
    connected components over the output must equal brute force's."""
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
    assert want and got  # non-trivial: planted pairs exist
    for (a, b), h in got.items():
        assert want.get((a, b)) == h, (a, b, h)
    nodes = range(40)
    assert _components(got, nodes) == _components(want, nodes)
    # the planted population contains identical signatures (i % 3 == 0
    # members of the cluster are exactly `base`), so the collapse must
    # have dropped redundant within-group pairs: strictly fewer pairs
    same_sig = [i for i in range(40) if i % 4 == 0 and i % 3 == 0]
    assert len(same_sig) >= 3 and len(got) < len(want)
    # star pairs ride the min-id representative
    rep = min(same_sig)
    for m in same_sig:
        if m != rep:
            assert got.get((rep, m)) == 0


def test_identical_signature_collapse_is_linear(spark):
    """10³ byte-distinct blank-ish docs hashing to ONE signature (the
    crawled-corpus degenerate mass) must emit pairs LINEAR in group
    size — the n-1 star pairs — not the ~5·10⁵ full clique."""
    rows = [(i, 42) for i in range(1000)] + [(2000, -77), (2001, -77)]
    df = spark.createDataFrame(rows, "doc_id bigint, dhash bigint")
    pairs = near_dup_image_pairs(df, max_hamming=3).collect()
    star = {(r.id_a, r.id_b) for r in pairs if r.hamming == 0}
    assert len(pairs) == 999 + 1 + (1 if _ham(42, -77) <= 3 else 0)
    assert {(0, i) for i in range(1, 1000)} <= star
    assert (2000, 2001) in star


def test_hot_band_cap_engages_and_audits(spark):
    """A band shared by more distinct signatures than the cap is
    skipped (deterministically), and hot_band_audit reports exactly
    that band. Planted geometry: one true <=3 pair that shares ONLY
    chunk 0 with its partner, drowned in a chunk-0 hot band."""
    from accounting_etl_spark.operators.image_hash import hot_band_audit

    base = (0b1 << 16) | (0b1 << 32) | (0b1 << 48)  # chunk0 = 0
    near = base ^ (1 << 20) ^ (1 << 40) ^ (1 << 60)  # flips chunks 1-3
    rows = [(0, base), (1, near)]
    # 60 fillers: chunk0 == 0 too, pseudorandom DISTINCT bits across
    # chunks 1-3 so only the (0, 0) band goes hot
    fillers = {
        ((i + 1) * 0x9E3779B97F4A7C15) & ((1 << 63) - 1) & ~0xFFFF
        for i in range(60)
    }
    rows += [(10 + i, h) for i, h in enumerate(sorted(fillers))]
    df = spark.createDataFrame(rows, "doc_id bigint, dhash bigint")
    assert _ham(base, near) == 3
    uncapped = {
        (r.id_a, r.id_b)
        for r in near_dup_image_pairs(
            df, max_hamming=3, max_posting=None
        ).collect()
    }
    assert (0, 1) in uncapped
    capped = {
        (r.id_a, r.id_b)
        for r in near_dup_image_pairs(
            df, max_hamming=3, max_posting=50
        ).collect()
    }
    assert (0, 1) not in capped  # the only shared band was skipped
    audit = hot_band_audit(df, max_posting=50).collect()
    assert [(r.chunk, r.val) for r in audit] == [(0, 0)]
    assert audit[0].n_sigs == 2 + len(fillers)


def test_max_hamming_beyond_pigeonhole_raises(spark):
    df = spark.createDataFrame([(1, 2)], "doc_id bigint, dhash bigint")
    with pytest.raises(ValueError, match="pigeonhole"):
        near_dup_image_pairs(df, max_hamming=4, chunks=4)
    # 8 chunks restore the guarantee for distance 4
    near_dup_image_pairs(df, max_hamming=4, chunks=8)


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
        near_dup_image_pairs(image_hashes(df), max_hamming=3).count() == 0
    )


def test_corrupt_recognized_payloads_null_not_batch_kill(spark):
    """ADVICE r6 (medium): a corrupt-but-RECOGNIZED payload (truncated
    IDAT → zlib.error, truncated sample table → ValueError/None) must
    yield a NULL hash row, not kill the whole Arrow batch."""
    from accounting_etl_spark.operators.image_hash import (
        video_fingerprints,
    )

    img = _smooth()
    png = mc.encode_png(img)
    rows = [
        (1, bytearray(mc.encode_bmp(img))),
        (2, bytearray(png[:-20])),  # truncated zlib stream
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, content binary")
    got = {r.doc_id: r.dhash for r in image_hashes(df).collect()}
    assert got[1] is not None and got[2] is None

    frames = [np.roll(img, i, axis=1) for i in range(6)]
    mp4 = mc.encode_mp4_mjpeg(frames, fps=6, quality=92)
    vrows = [
        (1, bytearray(mp4)),
        (2, bytearray(mp4[: len(mp4) // 2])),  # truncated BMFF
    ]
    vdf = spark.createDataFrame(vrows, "doc_id bigint, content binary")
    vgot = {r.doc_id: r.fp for r in video_fingerprints(vdf).collect()}
    assert vgot[1] is not None and vgot[2] is None


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
