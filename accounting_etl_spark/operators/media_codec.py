"""Pure-stdlib/numpy media codecs for the multimodal operators.

The container has no PIL/ffmpeg, but several real formats are
decodable from public specs with nothing beyond numpy + the stdlib —
so the ``real_decode`` paths in
:mod:`accounting_etl_spark.operators.multimodal` no longer need to be
fully stubbed:

- **BMP** (Windows BITMAPINFOHEADER, uncompressed 24-bit): decode →
  ``uint8[H,W,3]`` RGB, encode back (bottom-up rows, 4-byte padding).
- **PPM** (binary P6): decode → RGB array.
- **PNG** (ISO/IEC 15948): zlib is in the stdlib, so full decode of
  8-bit gray / gray+alpha / RGB / RGBA / palette images with all five
  scanline filters (None/Sub/Up/Average/Paeth), plus encode (RGB,
  filter 0). Adam7 interlace raises ``NotImplementedError``.
- **GIF** (87a/89a): stdlib-only LZW decode of the first frame,
  global/local color tables, interlaced row order.
- **JPEG** (baseline, via :mod:`.jpeg_codec`): numpy DCT encoder and
  Huffman decoder — see that module; progressive raises.
- **WAV** (RIFF PCM) via the stdlib ``wave`` module: samples +
  sample-rate + channel metadata.
- **Nearest-neighbor resize** in numpy — the PIL-free resize kernel.
- **BMPS**: a trivial length-prefixed concatenation of BMP frames
  used as the *test* video container (real containers need ffmpeg;
  frame sampling semantics — every-Nth, capped, exact-ms timestamps —
  are identical for both).

Sniffers return None on unknown magic so callers can fall through to
PIL/ffmpeg or raise.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

# ---------------- BMP (BITMAPINFOHEADER, 24bpp, BI_RGB) --------------


def encode_bmp(rgb: np.ndarray) -> bytes:
    """uint8[H,W,3] RGB → 24-bit uncompressed BMP bytes."""
    h, w, c = rgb.shape
    assert c == 3 and rgb.dtype == np.uint8
    row_len = (w * 3 + 3) & ~3
    img_size = row_len * h
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + img_size, 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    body = bytearray()
    pad = b"\x00" * (row_len - w * 3)
    for y in range(h - 1, -1, -1):  # bottom-up
        body += rgb[y, :, ::-1].tobytes() + pad  # RGB→BGR
    return header + bytes(body)


def decode_bmp(payload: bytes) -> np.ndarray | None:
    """24-bit uncompressed BMP → uint8[H,W,3] RGB (None if not BMP)."""
    if payload[:2] != b"BM" or len(payload) < 54:
        return None
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only 24-bit BI_RGB BMP supported (bpp={bpp}, "
            f"compression={compression})"
        )
    bottom_up = h > 0
    h = abs(h)
    row_len = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        payload, np.uint8, count=row_len * h, offset=data_off
    ).reshape(h, row_len)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR→RGB


# ---------------- PPM (binary P6) ------------------------------------


def decode_ppm(payload: bytes) -> np.ndarray | None:
    if not payload.startswith(b"P6"):
        return None
    # header: P6 <w> <h> <maxval> with comments/whitespace
    fields: list[int] = []
    i = 2
    while len(fields) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            i = payload.index(b"\n", i) + 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        fields.append(int(payload[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = fields
    arr = np.frombuffer(payload, np.uint8, count=w * h * 3, offset=i)
    return arr.reshape(h, w, 3).copy()


def encode_ppm(rgb: np.ndarray) -> bytes:
    h, w, _ = rgb.shape
    return b"P6\n%d %d\n255\n" % (w, h) + rgb.astype(np.uint8).tobytes()


# ---------------- PNG (ISO/IEC 15948, stdlib zlib) --------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# samples per pixel by PNG color type (0 gray, 2 RGB, 3 palette,
# 4 gray+alpha, 6 RGBA)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(rgb: np.ndarray) -> bytes:
    """uint8[H,W,3] RGB → PNG bytes (color type 2, bit depth 8,
    filter 0 on every scanline)."""
    import zlib

    h, w, c = rgb.shape
    assert c == 3 and rgb.dtype == np.uint8
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + rgb[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def _png_unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo per-scanline filtering → uint8[h, stride] of recon bytes.

    Filter math is mod-256 byte arithmetic (PNG spec §9): Up and the
    Sub lane-cumsum vectorize; Average/Paeth carry a per-byte left
    dependency, so those rows fall back to a byte loop (fine for the
    fixture-scale images this container decodes)."""
    flt = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    out = np.zeros((h, stride), np.uint16)
    for y in range(h):
        ft = int(flt[y, 0])
        line = flt[y, 1:].astype(np.uint16)
        prev = out[y - 1] if y else np.zeros(stride, np.uint16)
        if ft == 0:  # None
            out[y] = line
        elif ft == 2:  # Up
            out[y] = (line + prev) & 0xFF
        elif ft == 1:  # Sub: prefix sum per byte lane
            lanes = line.reshape(-1, bpp).astype(np.uint64)
            out[y] = (np.cumsum(lanes, axis=0) & 0xFF).reshape(-1)
        else:  # Average (3) / Paeth (4): sequential left dependency
            row = out[y]
            for x in range(stride):
                a = int(row[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                if ft == 3:
                    row[x] = (int(line[x]) + ((a + b) >> 1)) & 0xFF
                elif ft == 4:
                    c_ = int(prev[x - bpp]) if x >= bpp else 0
                    p = a + b - c_
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c_)
                    pred = a if (pa <= pb and pa <= pc) else (
                        b if pb <= pc else c_
                    )
                    row[x] = (int(line[x]) + pred) & 0xFF
                else:
                    raise NotImplementedError(f"PNG filter type {ft}")
    return out.astype(np.uint8)


def decode_png(payload: bytes) -> np.ndarray | None:
    """PNG → uint8[H,W,3] RGB (alpha dropped, palette expanded);
    None if the signature doesn't match. 8-bit depth, no interlace."""
    import zlib

    if not payload.startswith(_PNG_SIG):
        return None
    off, idat, plte = len(_PNG_SIG), bytearray(), b""
    w = h = depth = ctype = interlace = 0
    while off + 8 <= len(payload):
        (ln,) = struct.unpack_from(">I", payload, off)
        tag = payload[off + 4 : off + 8]
        body = payload[off + 8 : off + 8 + ln]
        off += 12 + ln  # len + tag + body + crc
        if tag == b"IHDR":
            w, h, depth, ctype, _, _, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif tag == b"PLTE":
            plte = body
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if depth != 8 or interlace != 0:
        raise NotImplementedError(
            f"PNG bit depth {depth} / interlace {interlace} not supported "
            "(8-bit non-interlaced only)"
        )
    ch = _PNG_CHANNELS[ctype]
    recon = _png_unfilter(zlib.decompress(bytes(idat)), h, w * ch, ch)
    px = recon.reshape(h, w, ch)
    if ctype == 3:  # palette lookup
        pal = np.frombuffer(plte, np.uint8).reshape(-1, 3)
        return pal[px[:, :, 0]].copy()
    if ctype in (0, 4):  # gray (+alpha): replicate luma
        return np.repeat(px[:, :, :1], 3, axis=2).copy()
    return px[:, :, :3].copy()  # RGB / RGBA


# ---------------- GIF (87a/89a, stdlib LZW) ---------------------------


def _gif_lzw(data: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW decode (GIF89a spec appendix F)."""
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    code_size = min_code_size + 1
    out = bytearray()
    bitbuf = bitlen = 0
    prev: bytes | None = None
    for byte in data:
        bitbuf |= byte << bitlen
        bitlen += 8
        while bitlen >= code_size:
            code = bitbuf & ((1 << code_size) - 1)
            bitbuf >>= code_size
            bitlen -= code_size
            if code == clear:
                table = list(base)
                code_size = min_code_size + 1
                prev = None
                continue
            if code == end:
                return bytes(out)
            if code < len(table):
                entry = table[code]
                if prev is not None:
                    table.append(prev + entry[:1])
            elif prev is not None and code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("corrupt GIF LZW stream")
            out += entry
            prev = entry
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
    return bytes(out)


def decode_gif(payload: bytes) -> np.ndarray | None:
    """First frame of a GIF → uint8[H,W,3] RGB; None if not GIF."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    _, _, flags, _, _ = struct.unpack_from("<HHBBB", payload, 6)
    off = 13
    gct = b""
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = payload[off : off + 3 * n]
        off += 3 * n
    while off < len(payload):
        b0 = payload[off]
        if b0 == 0x21:  # extension: label + sub-blocks
            off += 2
            while payload[off]:
                off += 1 + payload[off]
            off += 1
        elif b0 == 0x2C:  # image descriptor
            _, _, iw, ih, iflags = struct.unpack_from("<HHHHB", payload, off + 1)
            off += 10
            ct = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                ct = payload[off : off + 3 * n]
                off += 3 * n
            min_code = payload[off]
            off += 1
            data = bytearray()
            while payload[off]:
                ln = payload[off]
                data += payload[off + 1 : off + 1 + ln]
                off += 1 + ln
            idx = np.frombuffer(
                _gif_lzw(bytes(data), min_code), np.uint8, count=iw * ih
            ).reshape(ih, iw)
            if iflags & 0x40:  # interlaced: pass order 0,4 / 8,4 / 2,4 / 1,2
                deinter = np.empty_like(idx)
                rows = [
                    y
                    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2))
                    for y in range(start, ih, step)
                ]
                deinter[np.array(rows)] = idx
                idx = deinter
            pal = np.frombuffer(ct, np.uint8).reshape(-1, 3)
            return pal[idx].copy()
        else:  # trailer (0x3B) or junk
            break
    return None


def decode_image(payload: bytes) -> np.ndarray | None:
    """Sniff-and-decode any supported still-image format.

    Raises ``NotImplementedError`` for a recognized format whose
    variant is unsupported (progressive JPEG, interlaced PNG, 16-bit
    depth) — callers with PIL installed may catch it and fall back.
    """
    from .jpeg_codec import decode_jpeg

    for dec in (decode_bmp, decode_ppm, decode_png, decode_gif,
                decode_jpeg):
        img = dec(payload)
        if img is not None:
            return img
    return None


def resize_nearest(rgb: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample to (height, width) — the classic
    index-map kernel, vectorized."""
    h, w, _ = rgb.shape
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return rgb[ys][:, xs]


# ---------------- WAV (RIFF PCM, stdlib wave) -------------------------


def decode_wav(payload: bytes) -> tuple[np.ndarray, int] | None:
    """PCM WAV → (int16 samples [n, channels], sample_rate); None if
    not RIFF/WAVE."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    with wave.open(io.BytesIO(payload), "rb") as f:
        rate = f.getframerate()
        n = f.getnframes()
        ch = f.getnchannels()
        width = f.getsampwidth()
        raw = f.readframes(n)
    if width == 2:
        arr = np.frombuffer(raw, np.int16)
    elif width == 1:
        arr = (np.frombuffer(raw, np.uint8).astype(np.int16) - 128) << 8
    else:
        raise NotImplementedError(f"sample width {width} not supported")
    return arr.reshape(-1, ch), rate


def encode_wav(
    samples: np.ndarray, sample_rate: int
) -> bytes:
    """int16 samples [n] or [n, channels] → PCM WAV bytes."""
    if samples.ndim == 1:
        samples = samples[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(samples.shape[1])
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


# ---------------- BMPS test video container ---------------------------

_BMPS_MAGIC = b"BMPS"


def encode_bmps(frames: list[np.ndarray], fps: int = 30) -> bytes:
    """Length-prefixed BMP frame sequence (test container; a real
    pipeline lands mp4/webm and decodes via ffmpeg)."""
    out = bytearray(_BMPS_MAGIC)
    out += struct.pack("<II", len(frames), fps)
    for fr in frames:
        b = encode_bmp(fr)
        out += struct.pack("<I", len(b)) + b
    return bytes(out)


def decode_bmps(payload: bytes) -> tuple[list[np.ndarray], int] | None:
    if payload[:4] != _BMPS_MAGIC:
        return None
    n, fps = struct.unpack_from("<II", payload, 4)
    frames = []
    off = 12
    for _ in range(n):
        (ln,) = struct.unpack_from("<I", payload, off)
        off += 4
        frames.append(decode_bmp(payload[off : off + ln]))
        off += ln
    return frames, fps
