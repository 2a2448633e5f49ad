"""VP8L (lossless webp) codec units.

Round-trips prove encoder/decoder consistency; the hand-assembled
bit-level fixtures pin the decoder's conventions (LSB-first reads,
MSB-of-code-first Huffman walk, CL-code order, prefix/distance
coding, transform inverses) against the spec text itself, so an
encoder/decoder convention inversion cannot silently cancel out —
same strategy as the hand-assembled third-party PDF fixtures.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from accounting_etl_spark.operators.webp_codec import (
    BitWriter,
    decode_vp8l,
    decode_webp,
    encode_webp,
    _DIST_MAP,
)


# ------------------------------------------------------------ roundtrip


@pytest.mark.parametrize(
    "shape", [(1, 1, 3), (3, 5, 3), (13, 7, 3), (16, 16, 4), (2, 9, 3)]
)
def test_roundtrip_random(shape):
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, shape).astype(np.uint8)
    out = decode_webp(encode_webp(img))
    assert (out == img[:, :, :3]).all()


def test_roundtrip_simple_code_paths():
    # constant color → single-symbol (zero-bit) codes
    img = np.full((4, 6, 3), 200, np.uint8)
    assert (decode_webp(encode_webp(img)) == img).all()
    # two values per channel → 2-symbol simple codes
    img = np.zeros((5, 3, 3), np.uint8)
    img[::2] = 255
    assert (decode_webp(encode_webp(img)) == img).all()


def test_container_dispatch():
    assert decode_webp(b"NOPE") is None
    lossy = b"RIFF" + struct.pack("<I", 12) + b"WEBP" + b"VP8 " + struct.pack("<I", 0)
    with pytest.raises(NotImplementedError):
        decode_webp(lossy)


def test_distance_map_matches_spec_prefix():
    assert _DIST_MAP[:22] == [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
        (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
        (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2),
    ]
    assert len(_DIST_MAP) == 120


# ------------------------------------- hand-assembled bit-level streams


def _header(bw: BitWriter, w: int, h: int) -> None:
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version


def _simple1(bw: BitWriter, symbol: int) -> None:
    """Simple code, one symbol (zero bits per read)."""
    bw.write(1, 1)
    bw.write(0, 1)  # num_symbols - 1
    if symbol > 1:
        bw.write(1, 1)
        bw.write(symbol, 8)
    else:
        bw.write(0, 1)
        bw.write(symbol, 1)


def _simple2(bw: BitWriter, s0: int, s1: int) -> None:
    """Simple code, two symbols: s0 → bit 0, s1 → bit 1."""
    bw.write(1, 1)
    bw.write(1, 1)
    if s0 > 1:
        bw.write(1, 1)
        bw.write(s0, 8)
    else:
        bw.write(0, 1)
        bw.write(s0, 1)
    bw.write(s1, 8)


def _green_two_symbol_normal(
    bw: BitWriter, a: int, b: int, alphabet: int = 280
) -> None:
    """Normal (code-length-coded) green code: symbols a < b, both
    length 1 — needed when a symbol exceeds 255 (e.g. LZ77 length
    codes), which simple codes cannot carry. Hand-writes the CL
    stream: CL code over values {0,1} with 1-bit codes (0→'len 0',
    1→'len 1'), then ``alphabet`` CL symbols."""
    bw.write(0, 1)  # not simple
    bw.write(0, 4)  # num_code_lengths = 4 → order [17, 18, 0, 1]
    bw.write(0, 3)  # CL len of 17
    bw.write(0, 3)  # CL len of 18
    bw.write(1, 3)  # CL len of value 0
    bw.write(1, 3)  # CL len of value 1
    bw.write(0, 1)  # no max_symbol shortcut
    for sym in range(alphabet):
        bw.write_code(1 if sym in (a, b) else 0, 1)


def test_hand_lz77_backref_and_distance_one():
    """4x1: one literal then a length-3 backref at spatial offset
    (1,0) — distance symbol 1 → dist_code 2 → _DIST_MAP[1] = (1,0) →
    pixel distance 1."""
    bw = BitWriter()
    _header(bw, 4, 1)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    _green_two_symbol_normal(bw, 10, 256 + 2)  # literal g=10, len code 2
    _simple1(bw, 20)  # red
    _simple1(bw, 30)  # blue
    _simple1(bw, 255)  # alpha
    _simple1(bw, 1)  # distance symbol → code 2 → (1,0)
    bw.write_code(0, 1)  # green literal 10 (code 0: 10 < 258)
    bw.write_code(1, 1)  # length symbol 258 → length = 2+1 = 3
    out = decode_vp8l(bytes(bw.bytes))
    assert out.shape == (1, 4, 4)
    assert (out == np.array([20, 10, 30, 255], np.uint8)).all()


def test_hand_color_cache_hit():
    """2x1 with a 4-bit color cache: literal pixel inserted, second
    pixel fetched purely from the cache (symbol 280 + index)."""
    argb = (255 << 24) | (9 << 16) | (7 << 8) | 5
    idx = ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - 4)
    bw = BitWriter()
    _header(bw, 2, 1)
    bw.write(0, 1)  # no transforms
    bw.write(1, 1)  # cache present
    bw.write(4, 4)  # cache bits
    bw.write(0, 1)  # no meta
    _green_two_symbol_normal(bw, 7, 280 + idx, alphabet=280 + 16)
    _simple1(bw, 9)  # red
    _simple1(bw, 5)  # blue
    _simple1(bw, 255)  # alpha
    _simple1(bw, 1)  # distance (unused)
    lit_first = 7 < 280 + idx
    bw.write_code(0 if lit_first else 1, 1)  # literal
    bw.write_code(1 if lit_first else 0, 1)  # cache hit
    out = decode_vp8l(bytes(bw.bytes))
    assert (out[0, 0] == out[0, 1]).all()
    assert tuple(out[0, 0]) == (9, 7, 5, 255)


def test_hand_subtract_green():
    bw = BitWriter()
    _header(bw, 1, 1)
    bw.write(1, 1)  # a transform
    bw.write(2, 2)  # subtract green
    bw.write(0, 1)  # no more transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    _simple1(bw, 100)  # green
    _simple1(bw, 10)  # red residual
    _simple1(bw, 250)  # blue residual
    _simple1(bw, 255)  # alpha
    _simple1(bw, 1)
    out = decode_vp8l(bytes(bw.bytes))
    # r = 10+100, b = (250+100) mod 256
    assert tuple(out[0, 0]) == (110, 100, 94, 255)


def _subimage_single_pixel(bw: BitWriter, a: int, r: int, g: int, b: int):
    """Entropy-coded 1x1 sub-image with constant channels."""
    bw.write(0, 1)  # no cache
    _simple1(bw, g)
    _simple1(bw, r)
    _simple1(bw, b)
    _simple1(bw, a)
    _simple1(bw, 1)


def test_hand_predictor_mode_T():
    """2x2, predictor transform, one block, mode 2 (Top). Residuals
    chosen so every corner exercises its edge rule."""
    bw = BitWriter()
    _header(bw, 2, 2)
    bw.write(1, 1)
    bw.write(0, 2)  # predictor transform
    bw.write(0, 3)  # size_bits = 2 → 4-px blocks → 1x1 sub-image
    _subimage_single_pixel(bw, 0, 0, 2, 0)  # mode in green = 2
    bw.write(0, 1)  # no more transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    # residual pixels: green two-symbol {3, 4}; red/blue/alpha const 0/0/1
    _green_two_symbol_normal(bw, 3, 4)
    _simple1(bw, 0)  # red residuals 0
    _simple1(bw, 0)  # blue residuals 0
    _simple1(bw, 1)  # alpha residuals 1
    _simple1(bw, 1)
    for code in (0, 1, 0, 1):  # greens: 3, 4, 3, 4
        bw.write_code(code, 1)
    out = decode_vp8l(bytes(bw.bytes))
    # (0,0): +ARGB(255,0,0,0)  → a=255+1? alpha residual 1 → 0
    # scan order applies alpha residual 1 everywhere:
    # (0,0): pred 0xff000000 → (a,r,g,b) = (0, 0, 3, 0) a=255+1 mod 256 = 0
    # (0,1): top row → pred = left = (0,0,3,0) → g = 3+4 = 7, a=0+1=1
    # (1,0): left col → pred = top  = (0,0,3,0) → g = 6, a = 1
    # (1,1): mode T → pred = (0,1): g = 7+4 = 11, a = 1+1 = 2
    rgba = out  # (h, w, 4) RGBA
    assert tuple(rgba[0, 0]) == (0, 3, 0, 0)
    assert tuple(rgba[0, 1]) == (0, 7, 0, 1)
    assert tuple(rgba[1, 0]) == (0, 6, 0, 1)
    assert tuple(rgba[1, 1]) == (0, 11, 0, 2)


def test_hand_color_transform():
    """1x1 color transform: g2r=2, g2b=3, r2b=-1 (0xff)."""
    bw = BitWriter()
    _header(bw, 1, 1)
    bw.write(1, 1)
    bw.write(1, 2)  # color transform
    bw.write(0, 3)  # size_bits = 2
    # element pixel: red ch = r2b, green ch = g2b, blue ch = g2r
    _subimage_single_pixel(bw, 0, 255, 3, 2)
    bw.write(0, 1)
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    _simple1(bw, 64)  # green
    _simple1(bw, 10)  # red residual
    _simple1(bw, 20)  # blue residual
    _simple1(bw, 255)
    _simple1(bw, 1)
    out = decode_vp8l(bytes(bw.bytes))
    # r = 10 + (2*64 >> 5) = 14; b = 20 + (3*64 >> 5) + ((-1*14) >> 5) = 25
    assert tuple(out[0, 0]) == (14, 64, 25, 255)


def test_hand_palette_with_bundling():
    """6x1, 2-color palette, indices [1,0,1,1,0,0] bundled into one
    green byte (LSB-first, 1 bit per index; packed width = 1).

    Palette entries are delta-coded: the stream carries (255,1,2,3)
    then the componentwise delta (0,1,1,1) → entry1 = (255,2,3,4).
    Two-symbol simple codes map the SMALLER symbol to bit 0.
    Per-pixel read order is green, red, blue, alpha; red uses a
    single-symbol (zero-bit) code since both entries encode red=1.
    """
    bw = BitWriter()
    _header(bw, 6, 1)
    bw.write(1, 1)
    bw.write(3, 2)  # color indexing
    bw.write(1, 8)  # palette size 2
    bw.write(0, 1)  # palette sub-image: no cache
    _simple2(bw, 1, 2)  # green values {2, 1}
    _simple1(bw, 1)  # red: both entries 1
    _simple2(bw, 1, 3)  # blue values {3, 1}
    _simple2(bw, 0, 255)  # alpha values {255, 0}
    _simple1(bw, 1)  # distance (unused)
    # entry0 = (g=2→bit1, r zero-bit, b=3→bit1, a=255→bit1)
    bw.write_code(1, 1)
    bw.write_code(1, 1)
    bw.write_code(1, 1)
    # entry1 delta = (g=1→bit0, r zero-bit, b=1→bit0, a=0→bit0)
    bw.write_code(0, 1)
    bw.write_code(0, 1)
    bw.write_code(0, 1)
    bw.write(0, 1)  # no more transforms
    # main (packed) image: 1x1, green byte = indices LSB-first
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta huffman
    _simple1(bw, 0b001101)  # [1,0,1,1,0,0] + 2 pad bits
    _simple1(bw, 0)
    _simple1(bw, 0)
    _simple1(bw, 255)
    _simple1(bw, 1)
    out = decode_vp8l(bytes(bw.bytes))
    pal = {0: (1, 2, 3, 255), 1: (2, 3, 4, 255)}
    expect = [pal[i] for i in (1, 0, 1, 1, 0, 0)]
    assert [tuple(px) for px in out[0]] == expect


def test_hand_meta_huffman_two_groups():
    """8x1 with an entropy image: pixels 0-3 use group 0 (red=1),
    pixels 4-7 group 1 (red=200)."""
    bw = BitWriter()
    _header(bw, 8, 1)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no cache
    bw.write(1, 1)  # meta huffman present
    bw.write(0, 3)  # hbits = 2 → entropy image 2x1
    # entropy sub-image: meta code = (red<<8)|green → greens {0,1}
    bw.write(0, 1)  # no cache
    _simple2(bw, 0, 1)  # green symbols 0,1
    _simple1(bw, 0)  # red 0
    _simple1(bw, 0)
    _simple1(bw, 0)
    _simple1(bw, 1)
    bw.write_code(0, 1)  # meta pixel 0 → group 0
    bw.write_code(1, 1)  # meta pixel 1 → group 1
    # group 0 trees: literal (g=5, r=1, b=0, a=255)
    _simple1(bw, 5)
    _simple1(bw, 1)
    _simple1(bw, 0)
    _simple1(bw, 255)
    _simple1(bw, 1)
    # group 1 trees: literal (g=6, r=200, b=0, a=255)
    _simple1(bw, 6)
    _simple1(bw, 200)
    _simple1(bw, 0)
    _simple1(bw, 255)
    _simple1(bw, 1)
    out = decode_vp8l(bytes(bw.bytes))
    assert [tuple(px) for px in out[0, :4]] == [(1, 5, 0, 255)] * 4
    assert [tuple(px) for px in out[0, 4:]] == [(200, 6, 0, 255)] * 4


def test_decode_image_dispatch_includes_webp():
    from accounting_etl_spark.operators.media_codec import decode_image

    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    assert (decode_image(encode_webp(img)) == img).all()


def _lossy_vp8_header(w, h):
    import struct as st

    body = (b"\x00\x00\x00"            # frame tag: keyframe
            + b"\x9d\x01\x2a"          # start code
            + st.pack("<HH", w, h)
            + b"\x00" * 16)            # truncated partition (probe-only)
    chunk = b"VP8 " + st.pack("<I", len(body)) + body
    riff = b"WEBP" + chunk
    return b"RIFF" + st.pack("<I", len(riff)) + riff


def test_probe_webp_lossy_header():
    from accounting_etl_spark.operators.webp_codec import (
        decode_webp,
        probe_webp,
    )
    import pytest

    payload = _lossy_vp8_header(320, 180)
    # full decode stays gated...
    with pytest.raises(NotImplementedError, match="lossy"):
        decode_webp(payload)
    # ...but the header probe reads the dims without entropy decode
    assert probe_webp(payload) == {
        "width": 320, "height": 180, "format": "vp8"
    }
    assert probe_webp(b"RIFFxxxxWAVExxxx") is None
    assert probe_webp(b"short") is None


def test_probe_webp_lossless_and_canvas():
    import struct as st

    from accounting_etl_spark.operators.webp_codec import (
        encode_webp,
        probe_webp,
    )
    import numpy as np

    rgb = np.zeros((7, 9, 3), dtype=np.uint8)
    enc = encode_webp(rgb)
    assert probe_webp(enc) == {"width": 9, "height": 7, "format": "vp8l"}
    # VP8X canvas overrides the codec-chunk dims
    vp8x_body = bytes(4) + (639).to_bytes(3, "little") + (359).to_bytes(
        3, "little"
    )
    vp8x = b"VP8X" + st.pack("<I", len(vp8x_body)) + vp8x_body
    inner = _lossy_vp8_header(16, 16)
    riff = b"WEBP" + vp8x + inner[12:]
    ext = b"RIFF" + st.pack("<I", len(riff)) + riff
    assert probe_webp(ext) == {
        "width": 640, "height": 360, "format": "vp8"
    }


def test_multimodal_lossy_webp_metadata_row(spark):
    from accounting_etl_spark.operators.multimodal import (
        extract_media_features,
    )

    df = spark.createDataFrame(
        [(3, "image", bytearray(_lossy_vp8_header(320, 180)))],
        "doc_id bigint, modality string, content binary",
    )
    row = extract_media_features(df, real_decode=True).toPandas().iloc[0]
    assert row["modality"] == "image"
    assert (row["width"], row["height"], row["n_frames"]) == (320, 180, 1)
