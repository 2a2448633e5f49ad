"""Built-in media codecs (operators/media_codec.py, jpeg_codec.py)
and the real-decode multimodal paths: BMP/PPM/PNG/GIF/JPEG/WAV/BMPS
round-trips in plain numpy, AVI (MJPG/DIB) and animated-GIF video
decode, MP4 box-walk metadata; webp lossless decodes natively
(webp_codec.py), only lossy webp and compressed-video DECODE
(h264 etc.) still need PIL/ffmpeg."""

from __future__ import annotations

import numpy as np
import pytest

from accounting_etl_spark.operators import jpeg_codec as jpeg
from accounting_etl_spark.operators import media_codec as mc


def _img(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_bmp_round_trip_odd_width():
    # width 3 -> 9-byte rows padded to 12: exercises the 4-byte pad
    img = _img(5, 3)
    assert np.array_equal(mc.decode_bmp(mc.encode_bmp(img)), img)
    img2 = _img(4, 6, seed=1)
    assert np.array_equal(mc.decode_bmp(mc.encode_bmp(img2)), img2)
    assert mc.decode_bmp(b"nope") is None


def test_ppm_round_trip_with_comment():
    img = _img(3, 4, seed=2)
    payload = b"P6\n# a comment\n4 3\n255\n" + img.tobytes()
    assert np.array_equal(mc.decode_ppm(payload), img)
    assert np.array_equal(mc.decode_ppm(mc.encode_ppm(img)), img)
    # sniffer dispatch
    assert np.array_equal(mc.decode_image(mc.encode_bmp(img)), img)
    assert mc.decode_image(b"\x89PNG....") is None


def test_wav_round_trip_mono_and_stereo():
    mono = (np.sin(np.linspace(0, 40, 800)) * 20000).astype(np.int16)
    samples, rate = mc.decode_wav(mc.encode_wav(mono, 16000))
    assert rate == 16000 and samples.shape == (800, 1)
    assert np.array_equal(samples[:, 0], mono)
    stereo = np.stack([mono, -mono], axis=1)
    samples2, rate2 = mc.decode_wav(mc.encode_wav(stereo, 8000))
    assert rate2 == 8000 and samples2.shape == (800, 2)
    assert np.array_equal(samples2, stereo)
    assert mc.decode_wav(b"RIFFxxxxJUNK") is None


def test_resize_nearest_exact():
    # 2x2 checkerboard doubled: each source pixel becomes a 2x2 block
    img = np.zeros((2, 2, 3), np.uint8)
    img[0, 0] = img[1, 1] = 255
    big = mc.resize_nearest(img, 4, 4)
    assert big.shape == (4, 4, 3)
    assert (big[:2, :2] == 255).all() and (big[:2, 2:] == 0).all()
    assert (big[2:, 2:] == 255).all() and (big[2:, :2] == 0).all()
    # downscale picks the index-mapped pixel
    small = mc.resize_nearest(big, 2, 2)
    assert np.array_equal(small, img)


def test_bmps_round_trip():
    frames = [_img(4, 4, seed=i) for i in range(5)]
    payload = mc.encode_bmps(frames, fps=10)
    got, fps = mc.decode_bmps(payload)
    assert fps == 10 and len(got) == 5
    for a, b in zip(got, frames):
        assert np.array_equal(a, b)
    assert mc.decode_bmps(b"BM..") is None


@pytest.fixture()
def media_df(spark):
    rows = [
        (1, "image", bytearray(mc.encode_bmp(_img(24, 32)))),
        (2, "image", bytearray(mc.encode_ppm(_img(8, 16, seed=3)))),
        (3, "audio", bytearray(mc.encode_wav(
            np.zeros(1600, np.int16), 16000))),
        (4, "video", bytearray(mc.encode_bmps(
            [_img(6, 8, seed=i) for i in range(90)], fps=30))),
        (5, "image", bytearray(
            jpeg.encode_jpeg(_img(12, 20, seed=9), quality=95))),
        (6, "image", bytearray(mc.encode_png(_img(10, 14, seed=4)))),
    ]
    return spark.createDataFrame(
        rows, "doc_id bigint, modality string, content binary"
    )


def test_real_decode_features(spark, media_df):
    from accounting_etl_spark.operators.multimodal import (
        extract_media_features,
    )

    pdf = (
        extract_media_features(media_df, real_decode=True)
        .toPandas().set_index("doc_id").sort_index()
    )
    assert pdf.loc[1, "width"] == 32 and pdf.loc[1, "height"] == 24
    assert pdf.loc[2, "width"] == 16 and pdf.loc[2, "modality"] == "image"
    assert pdf.loc[3, "sample_rate"] == 16000
    assert pdf.loc[3, "n_frames"] == 1600
    assert pdf.loc[4, "modality"] == "video"
    assert pdf.loc[4, "n_frames"] == 90 and pdf.loc[4, "width"] == 8
    # jpeg and png rows decode through the built-in codecs
    assert pdf.loc[5, "width"] == 20 and pdf.loc[5, "height"] == 12
    assert pdf.loc[6, "width"] == 14 and pdf.loc[6, "height"] == 10


def test_real_resize_and_frame_sampling(spark, media_df):
    from accounting_etl_spark.operators.multimodal import (
        resize_images,
        sample_frames,
    )

    out = (
        resize_images(media_df, width=8, height=8, real_decode=True)
        .toPandas().set_index("doc_id")
    )
    # all image rows (bmp/ppm/jpeg/png) resized; payload is an 8x8 BMP
    assert sorted(out.index) == [1, 2, 5, 6]
    for i in (1, 5, 6):
        small = mc.decode_bmp(bytes(out.loc[i, "content"]))
        assert small.shape == (8, 8, 3)

    frames = (
        sample_frames(media_df, every_n=30, max_frames=4, real_decode=True)
        .toPandas()
    )
    assert list(frames["frame_idx"]) == [0, 30, 60]
    assert list(frames["ts_ms"]) == [0, 1000, 2000]
    first = mc.decode_bmp(bytes(frames["frame"][0]))
    assert first.shape == (6, 8, 3)


def test_real_decode_unknown_magic_raises(spark):
    from accounting_etl_spark.operators.multimodal import (
        extract_media_features,
    )

    df = spark.createDataFrame(
        [(9, "image", bytearray(b"\x00WEIRD unknown container"))],
        "doc_id bigint, modality string, content binary",
    )
    with pytest.raises(Exception, match="NotImplementedError"):
        extract_media_features(df, real_decode=True).collect()


# ---------------- JPEG (operators/jpeg_codec.py) ----------------------


def test_jpeg_round_trip_smooth_gradient():
    from accounting_etl_spark.operators import jpeg_codec as jc

    h, w = 24, 40
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [
            xx * 255 // (w - 1),
            yy * 255 // (h - 1),
            (xx + yy) * 255 // (w + h - 2),
        ],
        axis=2,
    ).astype(np.uint8)
    out = jc.decode_jpeg(jc.encode_jpeg(img, quality=95))
    assert out.shape == img.shape
    # lossy, but smooth content at q95 stays within a few levels
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 4
    assert jc.decode_jpeg(b"notajpeg") is None


def test_jpeg_solid_color_is_exact():
    from accounting_etl_spark.operators import jpeg_codec as jc

    solid = np.full((16, 16, 3), 137, np.uint8)
    out = jc.decode_jpeg(jc.encode_jpeg(solid, quality=90))
    assert np.abs(out.astype(int) - 137).max() == 0


def test_jpeg_noise_odd_dims_and_stuffing():
    from accounting_etl_spark.operators import jpeg_codec as jc

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(17, 23, 3), dtype=np.uint8)
    jp = jc.encode_jpeg(img, quality=95)
    # noise maximizes entropy: the stuffed-0xFF path must be hit
    assert any(
        jp[i] == 0xFF and jp[i + 1] == 0x00 for i in range(2, len(jp) - 2)
    )
    out = jc.decode_jpeg(jp)
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.mean() < 8  # quantization noise, bounded

    # sniffer dispatch reaches JPEG
    assert np.array_equal(mc.decode_image(jp), out)


def test_jpeg_quality_tradeoff():
    from accounting_etl_spark.operators import jpeg_codec as jc

    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    hi = jc.encode_jpeg(img, quality=95)
    lo = jc.encode_jpeg(img, quality=30)
    assert len(lo) < len(hi)  # stronger quantization compresses more
    err_hi = np.abs(
        jc.decode_jpeg(hi).astype(int) - img.astype(int)
    ).mean()
    err_lo = np.abs(
        jc.decode_jpeg(lo).astype(int) - img.astype(int)
    ).mean()
    assert err_hi < err_lo


def test_jpeg_arithmetic_raises():
    # progressive (SOF2) now decodes (tests/test_jpeg_progressive.py);
    # arithmetic-coded frames (SOF9) remain gated
    from accounting_etl_spark.operators import jpeg_codec as jc

    img = np.full((8, 8, 3), 99, np.uint8)
    jp = bytearray(jc.encode_jpeg(img))
    sof = jp.find(b"\xff\xc0")
    jp[sof + 1] = 0xC9  # rewrite SOF0 → SOF9 (arithmetic sequential)
    with pytest.raises(NotImplementedError, match="arithmetic"):
        jc.decode_jpeg(bytes(jp))


# ---------------- PNG ------------------------------------------------


def _png_filter_forward(img, filters):
    """Independent forward filtering (PNG spec §9 math re-derived in
    the test) so decode is checked against a second implementation,
    not just our own encoder."""
    h, w, ch = img.shape
    stride = w * ch
    flat = img.reshape(h, stride).astype(int)
    raw = bytearray()
    for y, ft in enumerate(filters):
        prev = flat[y - 1] if y else np.zeros(stride, int)
        line = flat[y]
        out = np.empty(stride, int)
        for x in range(stride):
            a = line[x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) // 2
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out[x] = (line[x] - pred) % 256
        raw += bytes([ft]) + bytes(out.astype(np.uint8))
    return bytes(raw)


def _png_from_raw(w, h, ctype, raw, plte=b""):
    import struct as st
    import zlib

    ihdr = st.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    body = mc._png_chunk(b"IHDR", ihdr)
    if plte:
        body += mc._png_chunk(b"PLTE", plte)
    # split IDAT in two chunks to exercise concatenation
    z = zlib.compress(raw)
    body += mc._png_chunk(b"IDAT", z[:7]) + mc._png_chunk(b"IDAT", z[7:])
    return mc._PNG_SIG + body + mc._png_chunk(b"IEND", b"")


def test_png_round_trip():
    img = _img(7, 5, seed=3)
    assert np.array_equal(mc.decode_png(mc.encode_png(img)), img)
    assert mc.decode_png(b"\x89PNG....") is None
    # sniffer dispatch reaches PNG
    assert np.array_equal(mc.decode_image(mc.encode_png(img)), img)


def test_png_all_filter_types():
    img = _img(5, 4, seed=4)
    raw = _png_filter_forward(img, [0, 1, 2, 3, 4])
    assert np.array_equal(mc.decode_png(_png_from_raw(4, 5, 2, raw)), img)


def test_png_gray_palette_rgba():
    # grayscale (ctype 0): luma replicated to 3 channels
    gray = _img(3, 4, seed=5)[:, :, 0]
    raw = b"".join(b"\x00" + gray[y].tobytes() for y in range(3))
    out = mc.decode_png(_png_from_raw(4, 3, 0, raw))
    assert np.array_equal(out, np.repeat(gray[:, :, None], 3, axis=2))
    # palette (ctype 3)
    plte = bytes(range(30))  # 10 RGB entries
    idx = np.array([[0, 9, 3, 7], [5, 1, 8, 2], [4, 6, 0, 9]], np.uint8)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(3))
    out = mc.decode_png(_png_from_raw(4, 3, 3, raw, plte=plte))
    pal = np.frombuffer(plte, np.uint8).reshape(-1, 3)
    assert np.array_equal(out, pal[idx])
    # RGBA (ctype 6): alpha dropped
    rgba = np.dstack([_img(3, 4, seed=6), np.full((3, 4), 128, np.uint8)])
    raw = b"".join(b"\x00" + rgba[y].tobytes() for y in range(3))
    out = mc.decode_png(_png_from_raw(4, 3, 6, raw))
    assert np.array_equal(out, rgba[:, :, :3])


def test_png_adam7_interlace_round_trip():
    """Progressive (Adam7) PNG decodes natively: 7 independently
    filtered sub-images scattered back onto the canvas — exact
    round trip, including odd dimensions where late passes carry
    the remainder rows/columns."""
    for h, w in [(3, 4), (8, 8), (13, 17), (1, 1), (2, 9)]:
        img = _img(h, w, seed=h * 31 + w)
        enc = mc.encode_png(img, interlace=True)
        assert np.array_equal(mc.decode_png(enc), img), (h, w)
        # interlaced and sequential encodes agree pixel-for-pixel
        assert np.array_equal(
            mc.decode_png(mc.encode_png(img)), mc.decode_png(enc)
        )


def test_png_adam7_with_filters():
    """Adam7 passes whose scanlines use Sub/Up filters (a foreign
    encoder's choice) unfilter per pass, not across passes."""
    import struct as st
    import zlib

    img = _img(6, 6, seed=42)
    parts = []
    for x0, y0, xs, ys in mc._ADAM7:
        sub = img[y0::ys, x0::xs]
        if sub.size == 0:
            continue
        for y in range(len(sub)):
            line = sub[y].tobytes()
            if y == 0:
                # Sub filter on the first row of each pass
                arr = np.frombuffer(line, np.uint8).astype(np.int16)
                d = arr.copy()
                d[3:] = (arr[3:] - arr[:-3]) & 0xFF
                parts.append(b"\x01" + d.astype(np.uint8).tobytes())
            else:
                # Up filter against the previous row of the SAME pass
                prev = sub[y - 1].tobytes()
                a = np.frombuffer(line, np.uint8).astype(np.int16)
                b = np.frombuffer(prev, np.uint8).astype(np.int16)
                parts.append(
                    b"\x02" + ((a - b) & 0xFF).astype(np.uint8).tobytes()
                )
    ihdr = st.pack(">IIBBBBB", 6, 6, 8, 2, 0, 0, 1)
    payload = (
        mc._PNG_SIG
        + mc._png_chunk(b"IHDR", ihdr)
        + mc._png_chunk(b"IDAT", zlib.compress(b"".join(parts)))
        + mc._png_chunk(b"IEND", b"")
    )
    assert np.array_equal(mc.decode_png(payload), img)


# ---------------- GIF ------------------------------------------------


def _encode_gif(idx, pal_bits=7):
    """Minimal test-side GIF89a encoder using the classic
    'uncompressed LZW' trick: emit a clear code before every pixel so
    the code size never grows."""
    import struct as st

    h, w = idx.shape
    n_colors = 2 << pal_bits
    min_code = 8
    clear, end = 1 << min_code, (1 << min_code) + 1
    code_size = min_code + 1
    bits = bytearray()
    bitbuf = bitlen = 0

    def emit(code):
        nonlocal bitbuf, bitlen
        bitbuf |= code << bitlen
        bitlen += code_size
        while bitlen >= 8:
            bits.append(bitbuf & 0xFF)
            bitbuf >>= 8
            bitlen -= 8

    emit(clear)
    for px in idx.reshape(-1):
        emit(int(px))
        emit(clear)
    emit(end)
    if bitlen:
        bits.append(bitbuf & 0xFF)

    out = bytearray(b"GIF89a")
    out += st.pack("<HHBBB", w, h, 0x80 | pal_bits, 0, 0)
    # gray palette: entry i = (i, i, i)
    out += bytes(v for i in range(n_colors) for v in (i % 256,) * 3)
    # graphic control extension (exercises the extension-skip path)
    out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    out += b"\x2c" + st.pack("<HHHHB", 0, 0, w, h, 0) + bytes([min_code])
    for i in range(0, len(bits), 255):
        chunk = bits[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


def test_gif_decode_first_frame():
    rng = np.random.default_rng(7)
    idx = rng.integers(0, 256, size=(5, 6), dtype=np.uint8)
    gif = _encode_gif(idx)
    out = mc.decode_gif(gif)
    pal = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)
    assert np.array_equal(out, pal[idx])
    assert mc.decode_gif(b"notagif") is None
    # sniffer dispatch reaches GIF
    assert np.array_equal(mc.decode_image(gif), pal[idx])


# ---------------- audio features -------------------------------------


def test_real_audio_features_sine_wave(spark):
    from accounting_etl_spark.operators.multimodal import (
        extract_audio_features,
    )

    rate = 16000
    t = np.arange(rate)  # 1 second
    # 440 Hz tone at half amplitude + a quiet 2 kHz overtone
    sig = (
        0.5 * np.sin(2 * np.pi * 440 * t / rate)
        + 0.05 * np.sin(2 * np.pi * 2000 * t / rate)
    )
    wav = mc.encode_wav((sig * 32767).astype(np.int16), rate)
    silence = mc.encode_wav(np.zeros(8000, np.int16), 8000)
    df = spark.createDataFrame(
        [(1, "audio", bytearray(wav)), (2, "audio", bytearray(silence)),
         (3, "image", bytearray(b"ignored"))],
        "doc_id bigint, modality string, content binary",
    )
    out = (
        extract_audio_features(df, real_decode=True)
        .toPandas().set_index("doc_id").sort_index()
    )
    assert sorted(out.index) == [1, 2]  # image row filtered out
    tone = out.loc[1]
    assert tone["sample_rate"] == rate
    assert tone["duration_ms"] == 1000
    # 0.5 amplitude sine: rms ~ 0.3536, peak ~ 0.55 combined
    assert abs(tone["rms"] - 0.5 / np.sqrt(2)) < 0.01
    assert abs(tone["dominant_freq_hz"] - 440.0) < 1.0
    # centroid pulled slightly above 440 by the 2 kHz overtone
    assert 440.0 < tone["spectral_centroid_hz"] < 1000.0
    # 440 Hz tone crosses zero ~880 times/sec
    assert abs(tone["zero_cross_rate"] * rate - 880) < 10
    sil = out.loc[2]
    assert sil["rms"] == 0.0 and sil["peak"] == 0.0
    assert sil["duration_ms"] == 1000


def test_fake_audio_features_deterministic(spark):
    from accounting_etl_spark.operators.multimodal import (
        extract_audio_features,
    )

    df = spark.createDataFrame(
        [(1, "audio", bytearray(b"payload-bytes"))],
        "doc_id bigint, modality string, content binary",
    )
    a = extract_audio_features(df).collect()[0]
    b = extract_audio_features(df).collect()[0]
    assert a == b  # md5-derived, replay-stable
    assert a["sample_rate"] in range(8000, 56000, 8000)


# ---------------- AVI container ---------------------------------------


def _gradient_frames(n, h=24, w=32):
    """JPEG-friendly smooth frames with a per-frame brightness shift."""
    y, x = np.mgrid[0:h, 0:w]
    base = ((y * 255 // max(1, h - 1) + x * 255 // max(1, w - 1)) // 2)
    return [
        np.stack([(base + 20 * i) % 256] * 3, axis=-1).astype(np.uint8)
        for i in range(n)
    ]


def test_avi_mjpeg_round_trip():
    frames = _gradient_frames(6)
    avi = mc.encode_avi_mjpeg(frames, fps=10, quality=90)
    assert avi[:4] == b"RIFF" and avi[8:12] == b"AVI "
    out = mc.decode_avi(avi)
    assert out is not None
    dec, fps = out
    assert fps == 10 and len(dec) == 6
    for orig, got in zip(frames, dec):
        assert got.shape == orig.shape
        err = np.abs(got.astype(int) - orig.astype(int))
        assert err.mean() < 8 and err.max() < 64
    # sniffers: not-AVI returns None; decode_video dispatches to AVI
    assert mc.decode_avi(b"RIFFxxxxWAVE") is None
    assert mc.decode_avi(b"nope") is None
    vid = mc.decode_video(avi)
    assert vid is not None and len(vid[0]) == 6 and vid[1] == 10


def test_avi_dib_stream_exact():
    import struct as st

    rng = np.random.default_rng(3)
    frames = [
        rng.integers(0, 256, size=(5, 6, 3), dtype=np.uint8)
        for _ in range(2)
    ]
    h, w = 5, 6
    row_len = (w * 3 + 3) & ~3

    def chunk(fourcc, body):
        return fourcc + st.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b""
        )

    def lst(kind, body):
        return chunk(b"LIST", kind + body)

    def dib(fr):
        body = bytearray()
        pad = b"\x00" * (row_len - w * 3)
        for y in range(h - 1, -1, -1):  # bottom-up BGR rows
            body += fr[y, :, ::-1].tobytes() + pad
        return bytes(body)

    avih = st.pack("<14I", 1_000_000 // 5, 0, 0, 0, 2, 0, 1, 0, w, h,
                   0, 0, 0, 0)
    strh = st.pack("<4s4sIHHIIIIIIiI4H", b"vids", b"DIB ", 0, 0, 0, 0,
                   1, 5, 0, 2, 0, -1, 0, 0, 0, w, h)
    strf = st.pack("<IiiHH4sIiiII", 40, w, h, 1, 24,
                   b"\x00\x00\x00\x00", row_len * h, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00db", dib(f)) for f in frames))
    body = b"AVI " + hdrl + movi
    avi = b"RIFF" + st.pack("<I", len(body)) + body

    dec, fps = mc.decode_avi(avi)
    assert fps == 5 and len(dec) == 2
    for orig, got in zip(frames, dec):
        assert np.array_equal(orig, got)


def test_avi_unknown_codec_raises():
    frames = _gradient_frames(1)
    avi = bytearray(mc.encode_avi_mjpeg(frames, fps=30))
    idx = avi.index(b"MJPG", avi.index(b"strf"))  # strf biCompression
    avi[idx : idx + 4] = b"H264"
    avi2 = bytes(avi).replace(b"MJPG", b"H264")  # strh handler too
    with pytest.raises(NotImplementedError):
        mc.decode_avi(avi2)


# ---------------- animated GIF ----------------------------------------


def _encode_gif_anim(frame_specs, sw, sh, delays_cs):
    """Multi-frame GIF89a: frame_specs = [(idx_array, x, y, disposal,
    transparent_or_None)], global gray palette, uncompressed-LZW
    trick as in _encode_gif."""
    import struct as st

    min_code = 8
    clear, end = 1 << min_code, (1 << min_code) + 1
    code_size = min_code + 1

    def lzw(idx):
        bits = bytearray()
        bitbuf = bitlen = 0

        def emit(code):
            nonlocal bitbuf, bitlen
            bitbuf |= code << bitlen
            bitlen += code_size
            while bitlen >= 8:
                bits.append(bitbuf & 0xFF)
                bitbuf >>= 8
                bitlen -= 8

        emit(clear)
        for px in idx.reshape(-1):
            emit(int(px))
            emit(clear)
        emit(end)
        if bitlen:
            bits.append(bitbuf & 0xFF)
        return bits

    out = bytearray(b"GIF89a")
    out += st.pack("<HHBBB", sw, sh, 0x80 | 7, 0, 0)
    out += bytes(v for i in range(256) for v in (i,) * 3)
    for (idx, x, y, disposal, transp), delay in zip(frame_specs, delays_cs):
        gflags = (disposal & 7) << 2 | (1 if transp is not None else 0)
        out += b"\x21\xf9\x04" + st.pack(
            "<BHB", gflags, delay, transp or 0
        ) + b"\x00"
        ih, iw = idx.shape
        out += b"\x2c" + st.pack("<HHHHB", x, y, iw, ih, 0)
        out += bytes([min_code])
        bits = lzw(idx)
        for i in range(0, len(bits), 255):
            part = bits[i : i + 255]
            out += bytes([len(part)]) + part
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def test_gif_animation_compositing():
    pal = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)
    f0 = np.full((4, 6), 10, np.uint8)
    # frame 1: partial rect at (2,1), transparent index 7 in a checker
    f1 = np.full((2, 3), 200, np.uint8)
    f1[0, 1] = 7
    gif = _encode_gif_anim(
        [(f0, 0, 0, 1, None), (f1, 2, 1, 1, 7)], 6, 4, [5, 20]
    )
    out = mc.decode_gif_frames(gif)
    assert out is not None
    frames, fps = out
    assert len(frames) == 2
    assert np.array_equal(frames[0], pal[f0])
    expect = pal[f0].copy()
    comp = f1.copy()
    expect[1:3, 2:5] = pal[comp]
    expect[1, 3] = pal[10]  # transparent pixel keeps the old canvas
    assert np.array_equal(frames[1], expect)
    # fps = 100 // median(5, 20) cs
    assert fps == 100 // 20 or fps == 100 // 5  # median of 2 = upper
    # single-frame GIF stays an image for the video sniffer
    single = _encode_gif(f0)
    assert mc.decode_video(single) is None
    assert mc.decode_video(gif) is not None


def test_multimodal_avi_end_to_end(spark):
    from accounting_etl_spark.operators.multimodal import (
        extract_media_features,
        sample_frames,
    )

    frames = _gradient_frames(7, h=6, w=8)
    avi = mc.encode_avi_mjpeg(frames, fps=2, quality=90)
    df = spark.createDataFrame(
        [(1, "video", bytearray(avi))],
        "doc_id bigint, modality string, content binary",
    )
    feats = extract_media_features(df, real_decode=True).toPandas()
    assert feats.loc[0, "modality"] == "video"
    assert feats.loc[0, "n_frames"] == 7
    assert (feats.loc[0, "width"], feats.loc[0, "height"]) == (8, 6)

    rows = sample_frames(
        df, every_n=3, max_frames=2, real_decode=True
    ).toPandas()
    assert list(rows["frame_idx"]) == [0, 3]
    assert list(rows["ts_ms"]) == [0, 1500]  # fps=2 → 3/2 s
    got = mc.decode_bmp(bytes(rows["frame"][1]))
    assert got.shape == (6, 8, 3)


# ---------------- MJPEG-in-MP4 ----------------------------------------


def test_mp4_mjpeg_round_trip():
    frames = _gradient_frames(5, h=16, w=20)
    mp4 = mc.encode_mp4_mjpeg(frames, fps=12, quality=90)
    assert mp4[4:8] == b"ftyp"
    out = mc.decode_mp4(mp4)
    assert out is not None
    dec, fps = out
    assert fps == 12 and len(dec) == 5
    for orig, got in zip(frames, dec):
        assert got.shape == orig.shape
        err = np.abs(got.astype(int) - orig.astype(int))
        assert err.mean() < 8 and err.max() < 64
    # sniffer chain dispatches BMFF too
    vid = mc.decode_video(mp4)
    assert vid is not None and len(vid[0]) == 5 and vid[1] == 12
    # probe agrees with the muxed headers
    meta = mc.probe_mp4(mp4)
    assert (meta["width"], meta["height"], meta["n_frames"]) == (20, 16, 5)
    assert meta["codec"] == "jpeg"
    assert mc.decode_mp4(b"notanmp4xxxx") is None


def test_mp4_sample_tables_multi_chunk_layout():
    """Foreign layout: two samples per chunk + a trailing 1-sample
    chunk (two stsc runs), exercising the chunk-run walk the minimal
    muxer never emits."""
    import struct as st

    frames = _gradient_frames(5, h=8, w=8)
    mp4 = bytearray(mc.encode_mp4_mjpeg(frames, fps=10, quality=90))
    got0 = mc.extract_mp4_samples(bytes(mp4))
    assert got0 is not None
    samples, codec, fps = got0
    assert codec == "jpeg" and fps == 10 and len(samples) == 5
    # rewrite stco (5 per-sample offsets) + stsc (one 1-per-chunk run)
    # into: chunks at samples 0,2,4 with stsc runs (1,2),(3,1)
    sizes = [len(s) for s in samples]
    offs = []
    off = None
    # locate current first offset from the existing stco
    i = bytes(mp4).index(b"stco")
    (n_ent,) = st.unpack_from(">I", mp4, i + 8)
    assert n_ent == 5
    (off,) = st.unpack_from(">I", mp4, i + 12)
    chunk_offsets = [off, off + sizes[0] + sizes[1],
                     off + sum(sizes[:4])]
    new_stco_body = st.pack(">II", 0, 3) + b"".join(
        st.pack(">I", o) for o in chunk_offsets
    )
    new_stco = st.pack(">I", 8 + len(new_stco_body)) + b"stco" + new_stco_body
    new_stsc_body = st.pack(">II", 0, 2) + st.pack(">III", 1, 2, 1) + st.pack(
        ">III", 3, 1, 1
    )
    new_stsc = st.pack(">I", 8 + len(new_stsc_body)) + b"stsc" + new_stsc_body

    buf = bytes(mp4)
    j = buf.index(b"stsc")
    (old_stsc_size,) = st.unpack_from(">I", buf, j - 4)
    buf = buf[: j - 4] + new_stsc + buf[j - 4 + old_stsc_size :]
    j = buf.index(b"stco")
    (old_stco_size,) = st.unpack_from(">I", buf, j - 4)
    buf = buf[: j - 4] + new_stco + buf[j - 4 + old_stco_size :]
    # fix enclosing box sizes (stbl/minf/mdia/trak/moov grew/shrank)
    delta = (len(new_stsc) - old_stsc_size) + (len(new_stco) - old_stco_size)
    for tag in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
        k = buf.index(tag)
        (sz,) = st.unpack_from(">I", buf, k - 4)
        buf = buf[: k - 4] + st.pack(">I", sz + delta) + buf[k:]

    got = mc.extract_mp4_samples(buf)
    assert got is not None
    samples2, _, _ = got
    assert samples2 == samples  # identical bytes through the new walk
    dec, _ = mc.decode_mp4(buf)
    assert len(dec) == 5


def test_mp4_compressed_codec_gated():
    frames = _gradient_frames(2, h=8, w=8)
    mp4 = mc.encode_mp4_mjpeg(frames, fps=10)
    bad = mp4.replace(b"jpeg", b"avc1", 1)  # stsd sample-entry fourcc
    with pytest.raises(NotImplementedError, match="avc1"):
        mc.decode_mp4(bad)


def test_multimodal_mp4_mjpeg_real_decode(spark):
    from accounting_etl_spark.operators.multimodal import (
        extract_media_features,
        sample_frames,
    )

    frames = _gradient_frames(7, h=6, w=8)
    mp4 = mc.encode_mp4_mjpeg(frames, fps=2, quality=90)
    df = spark.createDataFrame(
        [(1, "video", bytearray(mp4))],
        "doc_id bigint, modality string, content binary",
    )
    feats = extract_media_features(df, real_decode=True).toPandas()
    assert feats.loc[0, "modality"] == "video"
    assert feats.loc[0, "n_frames"] == 7
    assert (feats.loc[0, "width"], feats.loc[0, "height"]) == (8, 6)
    rows = sample_frames(
        df, every_n=3, max_frames=2, real_decode=True
    ).toPandas()
    assert list(rows["frame_idx"]) == [0, 3]
    assert list(rows["ts_ms"]) == [0, 1500]  # fps=2 → 3/2 s


# ---------------- MP4 metadata probe ----------------------------------


def _mini_mp4(w=640, h=360, n_frames=48, tscale=600, dur=1200,
              codec=b"avc1"):
    import struct as st

    def box(kind, body):
        return st.pack(">I", 8 + len(body)) + kind + body

    ftyp = box(b"ftyp", b"isom" + st.pack(">I", 0x200) + b"isomavc1")
    mvhd = box(b"mvhd", bytes(4) + st.pack(">III", 0, 0, tscale)
               + st.pack(">I", dur) + bytes(80))
    tkhd = box(b"tkhd", bytes(4) + bytes(72)
               + st.pack(">II", w << 16, h << 16))
    hdlr = box(b"hdlr", bytes(8) + b"vide" + bytes(14))
    stsd = box(b"stsd", bytes(8) + st.pack(">I", 86) + codec + bytes(78))
    stsz = box(b"stsz", st.pack(">III", 0, 0, n_frames))
    stbl = box(b"stbl", stsd + stsz)
    minf = box(b"minf", stbl)
    mdia = box(b"mdia", hdlr + minf)
    trak = box(b"trak", tkhd + mdia)
    moov = box(b"moov", mvhd + trak)
    return ftyp + moov


def test_probe_mp4():
    mp4 = _mini_mp4()
    meta = mc.probe_mp4(mp4)
    assert meta == {
        "brand": "isom", "width": 640, "height": 360, "n_frames": 48,
        "duration_ms": 2000, "codec": "avc1",
    }
    assert mc.probe_mp4(b"notanmp4butlongenough") is None
    # decode stays gated for compressed codecs / missing sample
    # tables: recognized container -> NotImplementedError (callers
    # fall back to the probe), matching the AVI codec-gate contract
    with pytest.raises(NotImplementedError):
        mc.decode_video(mp4)


def test_bmff_truncation_never_escapes_struct_error():
    """ADVICE r6 (low): every BMFF header read is bounded by its box
    end — ftyp + truncated moov at ANY cut point yields a partial
    probe / None samples, never struct.error/IndexError."""
    mp4 = _mini_mp4()
    for cut in range(8, len(mp4), 7):
        trunc = mp4[:cut]
        meta = mc.probe_mp4(trunc)
        assert meta is None or isinstance(meta, dict)
        got = mc.extract_mp4_samples(trunc)
        assert got is None or isinstance(got, tuple)
    # a declared largesize (size==1) cut before its 64-bit length
    bad = mp4[:4] + mp4[4:8] + mp4[8:12]  # keep ftyp start
    bad = mp4[:16] + b"\x00\x00\x00\x01moov\xff\xff"  # truncated header
    assert mc.probe_mp4(bad) is not None  # brand parsed, walk stops
    # a hostile fixed-size stsz declaring a huge count must not
    # allocate: build ftyp+moov with stsz fixed=1000, count=2**31
    import struct as st

    def box(kind, payload=b""):
        return st.pack(">I", 8 + len(payload)) + kind + payload

    stsz = box(b"stsz", st.pack(">IIII", 0, 1000, 2**31 - 1, 0))
    hdlr = box(b"hdlr", b"\x00" * 8 + b"vide" + b"\x00" * 12)
    stbl = box(b"stbl", stsz)
    moov = box(b"moov", box(b"trak", box(b"mdia", hdlr + box(b"minf", stbl))))
    ftyp = box(b"ftyp", b"isom\x00\x00\x02\x00isom")
    assert mc.extract_mp4_samples(ftyp + moov) is None


def test_multimodal_mp4_metadata_row(spark):
    from accounting_etl_spark.operators.multimodal import (
        extract_media_features,
    )

    df = spark.createDataFrame(
        [(9, "video", bytearray(_mini_mp4(w=320, h=240, n_frames=75)))],
        "doc_id bigint, modality string, content binary",
    )
    row = extract_media_features(df, real_decode=True).toPandas().iloc[0]
    assert row["modality"] == "video"
    assert (row["width"], row["height"], row["n_frames"]) == (320, 240, 75)


def test_png_16bit_depth_high_byte():
    """16-bit PNGs decode by taking each big-endian sample's high
    byte (the standard 16->8 map); filters operate bytewise with
    bpp = bytes per whole pixel."""
    import struct as st
    import zlib

    img = _img(5, 7, seed=11)
    img16 = (img.astype(np.uint16) << 8) | 0x42  # low byte is noise
    # sequential, filter 0
    raw = b"".join(
        b"\x00" + img16[y].astype(">u2").tobytes() for y in range(5)
    )
    ihdr = st.pack(">IIBBBBB", 7, 5, 16, 2, 0, 0, 0)
    payload = (
        mc._PNG_SIG
        + mc._png_chunk(b"IHDR", ihdr)
        + mc._png_chunk(b"IDAT", zlib.compress(raw))
        + mc._png_chunk(b"IEND", b"")
    )
    assert np.array_equal(mc.decode_png(payload), img)
    # Sub filter with the 6-byte pixel stride (bpp = 6 for 16-bit RGB)
    rows = []
    for y in range(5):
        line = np.frombuffer(
            img16[y].astype(">u2").tobytes(), np.uint8
        ).astype(np.int16)
        d = line.copy()
        d[6:] = (line[6:] - line[:-6]) & 0xFF
        rows.append(b"\x01" + d.astype(np.uint8).tobytes())
    payload2 = (
        mc._PNG_SIG
        + mc._png_chunk(b"IHDR", ihdr)
        + mc._png_chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + mc._png_chunk(b"IEND", b"")
    )
    assert np.array_equal(mc.decode_png(payload2), img)
    # 16-bit gray, Adam7
    g16 = (img[:, :, :1].astype(np.uint16) << 8)
    parts = []
    for x0, y0, xs, ys in mc._ADAM7:
        sub = g16[y0::ys, x0::xs]
        if sub.size == 0:
            continue
        parts += [
            b"\x00" + sub[y].astype(">u2").tobytes()
            for y in range(len(sub))
        ]
    ihdr_g = st.pack(">IIBBBBB", 7, 5, 16, 0, 0, 0, 1)
    payload3 = (
        mc._PNG_SIG
        + mc._png_chunk(b"IHDR", ihdr_g)
        + mc._png_chunk(b"IDAT", zlib.compress(b"".join(parts)))
        + mc._png_chunk(b"IEND", b"")
    )
    want = np.repeat(img[:, :, :1], 3, axis=2)
    assert np.array_equal(mc.decode_png(payload3), want)
    # unsupported combos still gated
    with pytest.raises(NotImplementedError):
        mc.decode_png(
            mc._PNG_SIG
            + mc._png_chunk(
                b"IHDR", st.pack(">IIBBBBB", 2, 2, 16, 3, 0, 0, 0)
            )
            + mc._png_chunk(b"IDAT", zlib.compress(b"\x00" * 10))
            + mc._png_chunk(b"IEND", b"")
        )
