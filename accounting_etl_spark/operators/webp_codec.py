"""WebP lossless (VP8L) codec — pure Python + numpy, no PIL.

Closes the webp gap in ``media_codec.decode_image`` (reference-parity
multimodal ingestion, reference ``attachments.py`` analog): the
decoder implements the public "WebP Lossless Bitstream Specification"
in full — all four transforms (predictor / color / subtract-green /
color-indexing incl. sub-byte pixel bundling), color cache, meta
Huffman (entropy image), and the LZ77 green/length/distance coding
with the 120-entry near-pixel distance map. The encoder is a minimal
but spec-valid literals-only stream (no transforms, no cache, two-
tier complete canonical codes) — enough for deterministic round-trip
tests and fixture generation.

Lossy WebP ('VP8 ' chunks — boolean-coded DCT) stays gated behind
``NotImplementedError`` → PIL fallback when installed, like h264 in
``media_codec.py``.

Bit conventions (the part a self-round-trip cannot prove, so they are
additionally pinned by hand-assembled bit-level fixtures in
tests/test_webp_codec.py): the stream is read LSB-first per byte;
``ReadBits(n)`` returns the first-read bit as the least significant;
Huffman codewords are canonical (DEFLATE assignment) and read one bit
at a time MSB-of-code first.
"""

from __future__ import annotations

import struct

import numpy as np

# ------------------------------------------------------------------ bits


class BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte = self.data[self.pos >> 3]
            v |= ((byte >> (self.pos & 7)) & 1) << i
            self.pos += 1
        return v


class BitWriter:
    def __init__(self) -> None:
        self.bytes = bytearray()
        self.bit = 0

    def write(self, value: int, n: int) -> None:
        for i in range(n):
            if self.bit == 0:
                self.bytes.append(0)
            if (value >> i) & 1:
                self.bytes[-1] |= 1 << self.bit
            self.bit = (self.bit + 1) & 7

    def write_code(self, code: int, length: int) -> None:
        """Huffman codeword: MSB of the code is written first."""
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)


# -------------------------------------------------------------- huffman


class HuffTree:
    """Canonical prefix code (DEFLATE assignment) decoded by walking
    bits MSB-of-code first. A single-symbol code costs zero bits."""

    def __init__(self, lengths: list[int]) -> None:
        nz = [(l, s) for s, l in enumerate(lengths) if l > 0]
        if not nz:
            raise ValueError("empty huffman code")
        if len(nz) == 1:
            self.single: int | None = nz[0][1]
            self.table: dict[tuple[int, int], int] = {}
            return
        self.single = None
        self.table = {}
        code = 0
        for length in range(1, max(l for l, _ in nz) + 1):
            for l, sym in nz:
                if l == length:
                    self.table[(length, code)] = sym
                    code += 1
            code <<= 1

    def read(self, br: BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        length = 0
        while True:
            code = (code << 1) | br.read(1)
            length += 1
            sym = self.table.get((length, code))
            if sym is not None:
                return sym
            if length > 15:
                raise ValueError("invalid huffman stream")


def canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), same canonical assignment the decoder
    expects (encoder side)."""
    out: dict[int, tuple[int, int]] = {}
    nz = sorted((l, s) for s, l in enumerate(lengths) if l > 0)
    code = 0
    prev_len = 0
    for l, s in nz:
        code <<= l - prev_len
        out[s] = (code, l)
        code += 1
        prev_len = l
    return out


_CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]


def _read_code_lengths(br: BitReader, cl_tree: HuffTree, n: int) -> list[int]:
    lengths = [0] * n
    if br.read(1):  # use max_symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = n
    symbol = 0
    prev_len = 8
    while symbol < n:
        if max_symbol == 0:
            break
        max_symbol -= 1
        cl = cl_tree.read(br)
        if cl < 16:
            lengths[symbol] = cl
            symbol += 1
            if cl != 0:
                prev_len = cl
        else:
            if cl == 16:
                repeat, fill = 3 + br.read(2), prev_len
            elif cl == 17:
                repeat, fill = 3 + br.read(3), 0
            else:
                repeat, fill = 11 + br.read(7), 0
            for _ in range(repeat):
                if symbol >= n:
                    break
                lengths[symbol] = fill
                symbol += 1
    return lengths


def _read_huffman_code(br: BitReader, alphabet_size: int) -> HuffTree:
    if br.read(1):  # simple code
        num_symbols = br.read(1) + 1
        first_nbits = 8 if br.read(1) else 1
        syms = [br.read(first_nbits)]
        if num_symbols == 2:
            syms.append(br.read(8))
        for s in syms:
            if s >= alphabet_size:
                raise ValueError("simple-code symbol out of range")
        if num_symbols == 1:
            return _single_tree(syms[0])
        lengths = [0] * alphabet_size
        for s in syms:
            lengths[s] = 1
        return HuffTree(lengths)
    num_codes = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_codes):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl_tree = HuffTree(cl_lengths)
    lengths = _read_code_lengths(br, cl_tree, alphabet_size)
    return HuffTree(lengths)


def _single_tree(symbol: int) -> HuffTree:
    """Zero-bit code: the one-symbol degenerate tree."""
    t = HuffTree.__new__(HuffTree)
    t.single = symbol
    t.table = {}
    return t


# ------------------------------------------------------------ lz77 bits


def _prefix_decode(br: BitReader, prefix_code: int) -> int:
    if prefix_code < 4:
        return prefix_code + 1
    extra = (prefix_code - 2) >> 1
    offset = (2 + (prefix_code & 1)) << extra
    return offset + br.read(extra) + 1


def _distance_map() -> list[tuple[int, int]]:
    """The 120 closest (dx, dy) pixel offsets in spec order: ascending
    squared distance, then larger dy first, then larger dx first."""
    cand = [
        (dx, dy)
        for dy in range(0, 9)
        for dx in range(-8, 9)
        if dy > 0 or dx > 0
    ]
    cand.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], -p[0]))
    return cand[:120]


_DIST_MAP = _distance_map()


def _plane_dist(code: int, xsize: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = _DIST_MAP[code - 1]
    return max(1, dy * xsize + dx)


# ----------------------------------------------------------- transforms

_PRED_BLACK = np.array([255, 0, 0, 0], np.int32)  # ARGB order


def _avg2(a, b):
    return (a.astype(np.int32) + b.astype(np.int32)) >> 1


def _predict(mode: int, L, T, TL, TR) -> np.ndarray:
    if mode == 0:
        return _PRED_BLACK
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return _avg2(_avg2(L, TR), T)
    if mode == 6:
        return _avg2(L, TL)
    if mode == 7:
        return _avg2(L, T)
    if mode == 8:
        return _avg2(TL, T)
    if mode == 9:
        return _avg2(T, TR)
    if mode == 10:
        return _avg2(_avg2(L, TL), _avg2(T, TR))
    if mode == 11:  # Select
        p = L.astype(np.int32) + T.astype(np.int32) - TL.astype(np.int32)
        pl = int(np.abs(p - L).sum())
        pt = int(np.abs(p - T).sum())
        return L if pl < pt else T
    if mode == 12:  # ClampAddSubtractFull
        v = L.astype(np.int32) + T.astype(np.int32) - TL.astype(np.int32)
        return np.clip(v, 0, 255)
    if mode == 13:  # ClampAddSubtractHalf
        ave = _avg2(L, T).astype(np.int32)
        v = ave + ((ave - TL.astype(np.int32)) >> 1)
        return np.clip(v, 0, 255)
    raise ValueError(f"predictor mode {mode}")


def _inv_predictor(img: np.ndarray, modes: np.ndarray, bits: int) -> None:
    """In-place inverse predictor transform. img: (h, w, 4) ARGB
    residuals → pixels. modes: sub-image green channel per block."""
    h, w, _ = img.shape
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = _PRED_BLACK
            elif y == 0:
                pred = img[0, x - 1]
            elif x == 0:
                pred = img[y - 1, 0]
            else:
                mode = int(modes[y >> bits, x >> bits])
                L = img[y, x - 1]
                T = img[y - 1, x]
                TL = img[y - 1, x - 1]
                # rightmost column: TR wraps to the first pixel of the
                # current row (linear scan-order addressing, per spec)
                TR = img[y - 1, x + 1] if x + 1 < w else img[y, 0]
                pred = _predict(mode, L, T, TL, TR)
            img[y, x] = (img[y, x].astype(np.int32) + pred) & 0xFF


def _inv_color_transform(img: np.ndarray, cte: np.ndarray, bits: int) -> None:
    """In-place inverse color transform. cte sub-image pixels carry
    (red=red_to_blue, green=green_to_blue, blue=green_to_red)."""
    h, w, _ = img.shape

    def s8(v):
        return v - 256 if v >= 128 else v

    for y in range(h):
        brow = cte[y >> bits]
        for x in range(w):
            e = brow[x >> bits]
            g2r = s8(int(e[3]))  # blue channel of the element
            g2b = s8(int(e[2]))  # green channel
            r2b = s8(int(e[1]))  # red channel
            a, r, g, b = (int(v) for v in img[y, x])
            g_s = s8(g)
            r = (r + ((g2r * g_s) >> 5)) & 0xFF
            b = (b + ((g2b * g_s) >> 5) + ((r2b * s8(r)) >> 5)) & 0xFF
            img[y, x, 1] = r
            img[y, x, 3] = b


def _inv_subtract_green(img: np.ndarray) -> None:
    g = img[:, :, 2].astype(np.int32)
    img[:, :, 1] = (img[:, :, 1].astype(np.int32) + g) & 0xFF
    img[:, :, 3] = (img[:, :, 3].astype(np.int32) + g) & 0xFF


# ------------------------------------------------------------- decoding


def _decode_image_stream(
    br: BitReader, w: int, h: int, level0: bool
) -> np.ndarray:
    """Decode one (possibly transformed) ARGB image → (h, w, 4) uint8
    in ARGB channel order."""
    orig_w = w
    transforms: list[tuple[int, object]] = []
    if level0:
        seen = set()
        while br.read(1):
            ttype = br.read(2)
            if ttype in seen:
                raise ValueError("duplicate transform")
            seen.add(ttype)
            if ttype in (0, 1):  # predictor / color
                bits = br.read(3) + 2
                bw = (w + (1 << bits) - 1) >> bits
                bh = (h + (1 << bits) - 1) >> bits
                sub = _decode_image_stream(br, bw, bh, False)
                transforms.append((ttype, (bits, sub)))
            elif ttype == 2:  # subtract green
                transforms.append((2, None))
            else:  # color indexing
                n_colors = br.read(8) + 1
                pal = _decode_image_stream(br, n_colors, 1, False)[0]
                pal = np.cumsum(pal.astype(np.int64), axis=0).astype(
                    np.int64
                ) & 0xFF
                pal = pal.astype(np.uint8)
                if n_colors <= 2:
                    width_bits = 3
                elif n_colors <= 4:
                    width_bits = 2
                elif n_colors <= 16:
                    width_bits = 1
                else:
                    width_bits = 0
                transforms.append((3, (width_bits, pal)))
                if width_bits > 0:
                    w = (w + (1 << width_bits) - 1) >> width_bits

    # color cache
    cache_bits = br.read(4) if br.read(1) else 0
    if cache_bits > 11:
        raise ValueError("color cache too large")
    cache = np.zeros(1 << cache_bits, np.uint32) if cache_bits else None

    # meta huffman
    if level0 and br.read(1):
        hbits = br.read(3) + 2
        ew = (w + (1 << hbits) - 1) >> hbits
        eh = (h + (1 << hbits) - 1) >> hbits
        entropy = _decode_image_stream(br, ew, eh, False)
        meta = (
            entropy[:, :, 1].astype(np.int32) << 8
        ) | entropy[:, :, 2].astype(np.int32)
        n_groups = int(meta.max()) + 1
    else:
        hbits = 0
        meta = None
        n_groups = 1

    green_size = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    groups = []
    for _ in range(n_groups):
        groups.append(
            (
                _read_huffman_code(br, green_size),
                _read_huffman_code(br, 256),  # red
                _read_huffman_code(br, 256),  # blue
                _read_huffman_code(br, 256),  # alpha
                _read_huffman_code(br, 40),  # distance
            )
        )

    n = w * h
    out = np.zeros((n, 4), np.uint8)  # ARGB
    pos = 0
    while pos < n:
        if meta is not None:
            y, x = divmod(pos, w)
            gidx = int(meta[y >> hbits, x >> hbits])
        else:
            gidx = 0
        g_tree, r_tree, b_tree, a_tree, d_tree = groups[gidx]
        s = g_tree.read(br)
        if s < 256:
            green = s
            red = r_tree.read(br)
            blue = b_tree.read(br)
            alpha = a_tree.read(br)
            out[pos] = (alpha, red, green, blue)
            if cache is not None:
                argb = (
                    (alpha << 24) | (red << 16) | (green << 8) | blue
                )
                cache[(0x1E35A7BD * argb & 0xFFFFFFFF) >> (32 - cache_bits)] = argb
            pos += 1
        elif s < 280:
            length = _prefix_decode(br, s - 256)
            dist_code = _prefix_decode(br, d_tree.read(br))
            dist = _plane_dist(dist_code, w)
            if dist > pos:
                raise ValueError("backref before start")
            for _ in range(length):
                if pos >= n:
                    break
                out[pos] = out[pos - dist]
                if cache is not None:
                    a, r, g, b = (int(v) for v in out[pos])
                    argb = (a << 24) | (r << 16) | (g << 8) | b
                    cache[
                        (0x1E35A7BD * argb & 0xFFFFFFFF) >> (32 - cache_bits)
                    ] = argb
                pos += 1
        else:
            if cache is None:
                raise ValueError("cache symbol without cache")
            argb = int(cache[s - 280])
            out[pos] = (
                (argb >> 24) & 0xFF,
                (argb >> 16) & 0xFF,
                (argb >> 8) & 0xFF,
                argb & 0xFF,
            )
            pos += 1

    img = out.reshape(h, w, 4)

    # inverse transforms, reverse order of appearance
    for ttype, arg in reversed(transforms):
        if ttype == 3:
            width_bits, pal = arg
            if width_bits > 0:
                per = 1 << width_bits
                bits_px = 8 >> width_bits
                mask = (1 << bits_px) - 1
                full_w = (w * per)
                idx = np.zeros((h, full_w), np.int32)
                greens = img[:, :, 2].astype(np.int32)
                for k in range(per):
                    idx[:, k::per] = (greens >> (k * bits_px)) & mask
            else:
                idx = img[:, :, 2].astype(np.int32)
                full_w = w
            safe = np.clip(idx, 0, pal.shape[0] - 1)
            mapped = pal[safe]
            mapped[idx >= pal.shape[0]] = 0
            # bundling rounds the packed width up: crop the overhang
            img = mapped[:, :orig_w]
            h, w = img.shape[:2]
        elif ttype == 2:
            _inv_subtract_green(img)
        elif ttype == 0:
            bits, sub = arg
            _inv_predictor(img, sub[:, :, 2], bits)
        elif ttype == 1:
            bits, sub = arg
            _inv_color_transform(img, sub, bits)
    return img


def decode_vp8l(payload: bytes) -> np.ndarray:
    """VP8L chunk payload → (h, w, 4) uint8 RGBA."""
    if not payload or payload[0] != 0x2F:
        raise ValueError("bad VP8L signature")
    br = BitReader(payload)
    br.pos = 8
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("unknown VP8L version")
    argb = _decode_image_stream(br, w, h, True)
    rgba = argb[:, :, [1, 2, 3, 0]].copy()  # ARGB → RGBA
    return rgba


def decode_webp(payload: bytes) -> np.ndarray | None:
    """RIFF/WEBP container → RGB uint8 array; None if not webp.

    Lossless ('VP8L') decodes natively; lossy ('VP8 ') raises
    ``NotImplementedError`` (boolean-coded DCT — PIL path when
    installed), mirroring the h264 gate in media_codec.
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        return None
    pos = 12
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if tag == b"VP8L":
            rgba = decode_vp8l(body)
            return rgba[:, :, :3].copy()
        if tag == b"VP8 ":
            raise NotImplementedError(
                "lossy (VP8) webp needs PIL; lossless (VP8L) is native"
            )
        pos += 8 + size + (size & 1)
    raise NotImplementedError("no VP8L/VP8 image chunk found in webp")


def probe_webp(payload: bytes) -> dict | None:
    """RIFF/WEBP → ``{width, height, format}`` from chunk headers
    alone — no entropy decode, so it covers the lossy 'VP8 ' frames
    the full decoder gates behind ``NotImplementedError``.

    Dimension sources: lossy keyframes carry 14-bit width/height after
    the 3-byte frame tag + 0x9D012A start code (RFC 6386 §9.1);
    lossless carries 14-bit dims after the 0x2F signature; extended
    'VP8X' files carry a 24-bit canvas size (the authoritative display
    dims) ahead of the codec chunk."""
    if len(payload) < 16 or payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        return None
    canvas: tuple[int, int] | None = None
    pos = 12
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if tag == b"VP8X" and len(body) >= 10:
            canvas = (
                1 + int.from_bytes(body[4:7], "little"),
                1 + int.from_bytes(body[7:10], "little"),
            )
        elif tag == b"VP8L" and len(body) >= 5 and body[0] == 0x2F:
            bits = int.from_bytes(body[1:5], "little")
            w, h = (bits & 0x3FFF) + 1, ((bits >> 14) & 0x3FFF) + 1
            if canvas:
                w, h = canvas
            return {"width": w, "height": h, "format": "vp8l"}
        elif tag == b"VP8 " and len(body) >= 10:
            keyframe = (body[0] & 1) == 0
            if canvas:
                w, h = canvas
            elif keyframe and body[3:6] == b"\x9d\x01\x2a":
                w = struct.unpack("<H", body[6:8])[0] & 0x3FFF
                h = struct.unpack("<H", body[8:10])[0] & 0x3FFF
            else:
                return None
            return {"width": w, "height": h, "format": "vp8"}
        pos += 8 + size + (size & 1)
    if canvas:
        return {"width": canvas[0], "height": canvas[1], "format": "vp8x"}
    return None


# ------------------------------------------------------------- encoding


def _two_tier_lengths(used: list[int], alphabet_size: int) -> list[int]:
    """Complete canonical code over the used symbols: k symbols get
    lengths L-1 / L with 2^L−k short codes — Kraft sum exactly 1."""
    k = len(used)
    lengths = [0] * alphabet_size
    if k == 1:
        lengths[used[0]] = 1  # handled by simple code instead
        return lengths
    L = max(1, (k - 1).bit_length())
    n_short = (1 << L) - k
    for i, s in enumerate(sorted(used)):
        lengths[s] = L - 1 if i < n_short and L > 1 else L
    return lengths


def _write_code_tree(bw: BitWriter, lengths: list[int]) -> None:
    """Emit a normal (non-simple) huffman code: CL tree over the
    distinct length values, then one CL symbol per alphabet entry."""
    distinct = sorted({l for l in lengths})
    # CL code over the distinct values (all < 16, no repeats used)
    cl_lengths = [0] * 19
    codes = _two_tier_lengths(distinct, 19) if len(distinct) > 1 else None
    if codes is None:
        cl_lengths[distinct[0]] = 1
    else:
        cl_lengths = codes
    bw.write(0, 1)  # not simple
    # num_code_lengths must cover every nonzero CL slot in order
    need = max(
        (i for i, s in enumerate(_CL_ORDER) if cl_lengths[s] > 0),
        default=0,
    )
    num_codes = max(4, need + 1)
    bw.write(num_codes - 4, 4)
    for i in range(num_codes):
        bw.write(cl_lengths[_CL_ORDER[i]], 3)
    bw.write(0, 1)  # no max_symbol
    cl_codes = canonical_codes(cl_lengths)
    single_cl = len([l for l in cl_lengths if l > 0]) == 1
    for l in lengths:
        if not single_cl:
            code, ln = cl_codes[l]
            bw.write_code(code, ln)
        # single-symbol CL tree: zero bits per symbol


def _write_simple_code(bw: BitWriter, symbols: list[int]) -> None:
    bw.write(1, 1)  # simple
    bw.write(len(symbols) - 1, 1)
    first = symbols[0]
    if first > 1:
        bw.write(1, 1)
        bw.write(first, 8)
    else:
        bw.write(0, 1)
        bw.write(first, 1)
    if len(symbols) == 2:
        bw.write(symbols[1], 8)


def _write_tree(bw: BitWriter, hist: dict[int, int], alphabet_size: int):
    """Write a code for the used symbols; returns symbol->(code,len)."""
    used = sorted(hist)
    if not used:
        used = [0]
    if len(used) <= 2:
        _write_simple_code(bw, used)
        if len(used) == 1:
            return {used[0]: (0, 0)}
        return {used[0]: (0, 1), used[1]: (1, 1)}
    lengths = _two_tier_lengths(used, alphabet_size)
    _write_code_tree(bw, lengths)
    return canonical_codes(lengths)


def encode_vp8l(rgb: np.ndarray) -> bytes:
    """(h, w, 3|4) uint8 → VP8L chunk payload. Literals only — no
    transforms, cache, or LZ77 (a valid minimal stream; size over
    speed is fine for fixtures)."""
    h, w = rgb.shape[:2]
    if rgb.shape[2] == 3:
        alpha = np.full((h, w, 1), 255, np.uint8)
        rgba = np.concatenate([rgb, alpha], axis=2)
    else:
        rgba = rgb
    bw = BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if (rgba[:, :, 3] != 255).any() else 0, 1)
    bw.write(0, 3)  # version
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta huffman

    flat = rgba.reshape(-1, 4)
    hists = [dict() for _ in range(4)]  # green, red, blue, alpha
    order = (1, 0, 2, 3)  # channel index per tree: g, r, b, a
    for px in flat:
        for t, c in enumerate(order):
            v = int(px[c])
            hists[t][v] = hists[t].get(v, 0) + 1
    g_codes = _write_tree(bw, hists[0], 256 + 24)
    r_codes = _write_tree(bw, hists[1], 256)
    b_codes = _write_tree(bw, hists[2], 256)
    a_codes = _write_tree(bw, hists[3], 256)
    d_codes = _write_tree(bw, {0: 1}, 40)  # unused distance tree
    del d_codes
    for px in flat:
        for codes, c in zip((g_codes, r_codes, b_codes, a_codes), order):
            code, ln = codes[int(px[c])]
            if ln:
                bw.write_code(code, ln)
    return bytes(bw.bytes)


def encode_webp(rgb: np.ndarray) -> bytes:
    """RGB(A) array → complete .webp file bytes (lossless)."""
    payload = encode_vp8l(rgb)
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff
