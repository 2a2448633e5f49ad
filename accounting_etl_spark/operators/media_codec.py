"""Pure-stdlib/numpy media codecs for the multimodal operators.

The container has no PIL/ffmpeg, but several real formats are
decodable from public specs with nothing beyond numpy + the stdlib —
so the ``real_decode`` paths in
:mod:`accounting_etl_spark.operators.multimodal` no longer need to be
fully stubbed:

- **BMP** (Windows BITMAPINFOHEADER, uncompressed 24-bit): decode →
  ``uint8[H,W,3]`` RGB, encode back (bottom-up rows, 4-byte padding).
- **PPM** (binary P6): decode → RGB array.
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


def decode_image(payload: bytes) -> np.ndarray | None:
    """Sniff-and-decode any supported still-image format."""
    for dec in (decode_bmp, decode_ppm):
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
