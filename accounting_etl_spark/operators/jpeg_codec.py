"""Pure-numpy baseline JPEG codec (ITU-T T.81 / ISO 10918-1).

The last still-image gap in the stdlib codec family
(:mod:`accounting_etl_spark.operators.media_codec`): baseline
sequential DCT JPEG, the format virtually every crawled image
payload actually uses. Everything here is from the public spec:

- **Encoder**: RGB → JFIF YCbCr → 8×8 blocks → 2-D DCT-II (one
  numpy matrix sandwich ``D @ B @ D.T``) → Annex-K quantization
  tables scaled by quality → zigzag → DPCM DC / run-length AC →
  Annex-K Huffman tables → byte-stuffed entropy stream with
  SOI/APP0/DQT/SOF0/DHT/SOS/EOI markers. 4:4:4 sampling (no chroma
  decimation) keeps the encoder simple; the decoder handles both.
- **Decoder**: marker parse (DQT/SOF0/DHT/SOS/DRI, restart
  markers), canonical Huffman reconstruction from (bits, values),
  MCU entropy decode, dequantize → inverse zigzag → IDCT → level
  shift, nearest-neighbor chroma upsampling for 4:2:0/4:2:2, BT.601
  YCbCr→RGB. **Progressive (SOF2)** is fully decoded too (T.81
  Annex G): per-component coefficient accumulators across scans,
  spectral selection (DC scans interleaved or not, AC scans
  single-component over the component's own block grid), successive
  approximation (DC bit refinement; AC first/refine with EOBn
  end-of-band run decoding and libjpeg-order correction bits),
  table redefinition between scans, restart intervals inside any
  scan kind, then one vectorized dequant+IDCT over the finished
  coefficient planes. Arithmetic coding and hierarchical mode raise
  ``NotImplementedError`` (vanishingly rare in crawled corpora; PIL
  remains the fallback when installed).

JPEG is lossy: round-trip tests assert bounded error (tight for
smooth content at high quality), not equality.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------- shared tables (T.81 Annex K) ------------------------

# K.1 / K.2 base quantization tables, natural (row-major) order
_QT_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], np.int32)
_QT_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], np.int32)

# zigzag scan order: _ZIGZAG[i] = flat natural index of the i-th
# zigzag coefficient
def _zigzag_order() -> np.ndarray:
    idx = np.arange(64).reshape(8, 8)
    out = []
    for s in range(15):
        diag = [(i, s - i) for i in range(8) if 0 <= s - i < 8]
        if s % 2 == 0:
            diag.reverse()
        out += [idx[i, j] for i, j in diag]
    return np.array(out)


_ZIGZAG = _zigzag_order()
_UNZIGZAG = np.argsort(_ZIGZAG)

# K.3 typical Huffman tables: (BITS counts per code length 1..16,
# HUFFVAL symbol list)
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# DCT-II basis matrix: coeffs = _DCT @ block @ _DCT.T
_DCT = np.array([
    [
        (np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8))
        * np.cos((2 * x + 1) * u * np.pi / 16)
        for x in range(8)
    ]
    for u in range(8)
])


def _canonical_codes(bits: list[int], vals: list[int]):
    """(BITS, HUFFVAL) → {symbol: (code, length)} per T.81 C.2."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


# ---------------- encoder -------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


def _magnitude(v: int) -> tuple[int, int]:
    """DPCM/AC value → (size category, appended bits)."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(quality, 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    qt = (base * scale + 50) // 100
    return np.clip(qt, 1, 255).astype(np.int32)


def _encode_channel(
    chan: np.ndarray, qt: np.ndarray, dc_codes, ac_codes, bw: _BitWriter,
    pred: int,
) -> int:
    h, w = chan.shape
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            block = chan[by : by + 8, bx : bx + 8].astype(np.float64) - 128.0
            coef = _DCT @ block @ _DCT.T
            q = np.round(coef / qt).astype(np.int32)
            zz = q.reshape(-1)[_ZIGZAG]
            diff = int(zz[0]) - pred
            pred = int(zz[0])
            size, bits = _magnitude(diff)
            c, ln = dc_codes[size]
            bw.write(c, ln)
            if size:
                bw.write(bits, size)
            run = 0
            last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
            for i in range(1, 64):
                v = int(zz[i])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    c, ln = ac_codes[0xF0]  # ZRL
                    bw.write(c, ln)
                    run -= 16
                size, bits = _magnitude(v)
                c, ln = ac_codes[(run << 4) | size]
                bw.write(c, ln)
                bw.write(bits, size)
                run = 0
            if last_nz < 63 or zz[63] == 0:
                c, ln = ac_codes[0x00]  # EOB
                bw.write(c, ln)
    return pred


def encode_jpeg(rgb: np.ndarray, quality: int = 90) -> bytes:
    """uint8[H,W,3] RGB → baseline JFIF bytes (4:4:4 sampling)."""
    h, w, c = rgb.shape
    assert c == 3 and rgb.dtype == np.uint8
    r = rgb[:, :, 0].astype(np.float64)
    g = rgb[:, :, 1].astype(np.float64)
    b = rgb[:, :, 2].astype(np.float64)
    ycc = [
        0.299 * r + 0.587 * g + 0.114 * b,
        128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
        128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
    ]
    ph, pw = -h % 8, -w % 8
    ycc = [
        np.clip(np.pad(p, ((0, ph), (0, pw)), mode="edge"), 0, 255)
        for p in ycc
    ]
    qts = [_scaled_qt(_QT_LUMA, quality), _scaled_qt(_QT_CHROMA, quality)]
    dc_l = _canonical_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_l = _canonical_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)
    dc_c = _canonical_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
    ac_c = _canonical_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS)

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(
        ">H5sBBBHHBB", 16, b"JFIF\x00", 1, 1, 0, 1, 1, 0, 0
    )
    for tid, qt in enumerate(qts):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid)
        out += bytes(int(x) for x in qt.reshape(-1)[_ZIGZAG])
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    for cid, (samp, tq) in enumerate([(0x11, 0), (0x11, 1), (0x11, 1)], 1):
        out += bytes([cid, samp, tq])
    for tc_th, bits, vals in [
        (0x00, _DC_LUMA_BITS, _DC_LUMA_VALS),
        (0x10, _AC_LUMA_BITS, _AC_LUMA_VALS),
        (0x01, _DC_CHROMA_BITS, _DC_CHROMA_VALS),
        (0x11, _AC_CHROMA_BITS, _AC_CHROMA_VALS),
    ]:
        out += b"\xff\xc4" + struct.pack(">HB", 3 + 16 + len(vals), tc_th)
        out += bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    out += bytes([1, 0x00, 2, 0x11, 3, 0x11])  # component: (dc<<4)|ac
    out += bytes([0, 63, 0])  # spectral selection (baseline fixed)

    # interleaved MCU order (4:4:4: one block per component per MCU)
    bw = _BitWriter()
    hh, ww = ycc[0].shape
    preds = [0, 0, 0]
    tables = [(qts[0], dc_l, ac_l), (qts[1], dc_c, ac_c), (qts[1], dc_c, ac_c)]
    for by in range(0, hh, 8):
        for bx in range(0, ww, 8):
            for ci in range(3):
                qt, dcc, acc = tables[ci]
                preds[ci] = _encode_channel(
                    ycc[ci][by : by + 8, bx : bx + 8], qt, dcc, acc, bw,
                    preds[ci],
                )
    bw.flush()
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------- decoder -------------------------------------------


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise EOFError("JPEG entropy stream truncated")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 1  # stuffed
                else:
                    raise EOFError("marker inside entropy stream")
            self.acc = byte
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def align(self) -> None:
        self.n = 0


def _decode_tree(bits: list[int], vals: list[int]):
    """(BITS, HUFFVAL) → {(length, code): symbol}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _read_symbol(br: _BitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        if (length, code) in table:
            return table[(length, code)]
    raise ValueError("invalid Huffman code")


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _parse_dqt(body: bytes, qts: dict) -> None:
    i = 0
    while i < len(body):
        pq, tq = body[i] >> 4, body[i] & 0xF
        n = 64 * (2 if pq else 1)
        raw = body[i + 1 : i + 1 + n]
        vals = np.frombuffer(raw, ">u2" if pq else np.uint8).astype(np.int32)
        qt = np.zeros(64, np.int32)
        qt[_ZIGZAG] = vals
        qts[tq] = qt.reshape(8, 8)
        i += 1 + n


def _parse_dht(body: bytes, huff: dict) -> None:
    i = 0
    while i < len(body):
        tc, th = body[i] >> 4, body[i] & 0xF
        bits = list(body[i + 1 : i + 17])
        n = sum(bits)
        vals = list(body[i + 17 : i + 17 + n])
        huff[(tc, th)] = _decode_tree(bits, vals)
        i += 17 + n


def decode_jpeg(payload: bytes) -> np.ndarray | None:
    """Baseline or progressive JPEG → uint8[H,W,3] RGB; None if not a
    JPEG."""
    if payload[:2] != b"\xff\xd8":
        return None
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps: list[dict] = []
    h = w = 0
    restart = 0
    progressive = False
    pos = 2
    while pos < len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (seg_len,) = struct.unpack_from(">H", payload, pos)
        body = payload[pos + 2 : pos + seg_len]
        if marker == 0xDB:  # DQT
            _parse_dqt(body, qts)
        elif marker == 0xC4:  # DHT
            _parse_dht(body, huff)
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 prog
            progressive = marker == 0xC2
            _, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            comps = []
            for ci in range(nc):
                cid, samp, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append({
                    "id": cid, "hs": samp >> 4, "vs": samp & 0xF, "tq": tq,
                })
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF marker 0x{marker:02X} (lossless/arithmetic/"
                "hierarchical) not supported; baseline + progressive only"
            )
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if progressive:
                return _decode_progressive(
                    payload, pos, comps, qts, huff, h, w, restart
                )
            ns = body[0]
            for ci in range(ns):
                cid, tt = body[1 + 2 * ci], body[2 + 2 * ci]
                for comp in comps:
                    if comp["id"] == cid:
                        comp["dc"] = tt >> 4
                        comp["ac"] = tt & 0xF
            data_start = pos + seg_len
            return _decode_scan(
                payload, data_start, comps, qts, huff, h, w, restart
            )
        pos += seg_len
    raise ValueError("no SOS marker found")


def _decode_scan(payload, start, comps, qts, huff, h, w, restart):
    hmax = max(c["hs"] for c in comps)
    vmax = max(c["vs"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for c in comps:
        pw = mcux * 8 * c["hs"]
        ph = mcuy * 8 * c["vs"]
        planes.append(np.zeros((ph, pw), np.float64))
    br = _BitReader(payload[start:])
    preds = [0] * len(comps)
    n_mcu = mcux * mcuy
    for m in range(n_mcu):
        if restart and m and m % restart == 0:
            br.align()
            # skip the RSTn marker bytes
            while (
                br.pos + 1 < len(br.data)
                and br.data[br.pos] == 0xFF
                and 0xD0 <= br.data[br.pos + 1] <= 0xD7
            ):
                br.pos += 2
            preds = [0] * len(comps)
        my, mx = divmod(m, mcux)
        for ci, c in enumerate(comps):
            for vy in range(c["vs"]):
                for vx in range(c["hs"]):
                    s = _read_symbol(br, huff[(0, c["dc"])])
                    diff = _extend(br.bits(s), s) if s else 0
                    preds[ci] += diff
                    zz = np.zeros(64, np.int32)
                    zz[0] = preds[ci]
                    k = 1
                    while k < 64:
                        rs = _read_symbol(br, huff[(1, c["ac"])])
                        r, s = rs >> 4, rs & 0xF
                        if rs == 0x00:  # EOB
                            break
                        if rs == 0xF0:  # ZRL
                            k += 16
                            continue
                        k += r
                        if k > 63:
                            raise ValueError("AC run past block end")
                        zz[k] = _extend(br.bits(s), s)
                        k += 1
                    q = np.zeros(64, np.int32)
                    q[_ZIGZAG] = zz
                    block = q.reshape(8, 8) * qts[c["tq"]]
                    px = _DCT.T @ block @ _DCT + 128.0
                    y0 = (my * c["vs"] + vy) * 8
                    x0 = (mx * c["hs"] + vx) * 8
                    planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px
    return _assemble_rgb(comps, planes, h, w, hmax, vmax)


def _assemble_rgb(comps, planes, h, w, hmax, vmax) -> np.ndarray:
    """Upsample component planes to full resolution, crop, and convert
    BT.601 YCbCr → RGB (shared by the baseline and progressive
    paths)."""
    full = []
    for c, p in zip(comps, planes):
        ry, rx = vmax // c["vs"], hmax // c["hs"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        y = np.clip(full[0], 0, 255)
        return np.repeat(y[:, :, None], 3, axis=2).astype(np.uint8)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------- progressive mode (T.81 Annex G) ---------------------


def _entropy_end(payload: bytes, start: int) -> int:
    """Index of the first real marker (not a stuffed 0x00, not RSTn)
    after ``start`` — the end of one scan's entropy data."""
    i, n = start, len(payload)
    while i + 1 < n:
        if payload[i] == 0xFF:
            nxt = payload[i + 1]
            if nxt != 0x00 and not (0xD0 <= nxt <= 0xD7):
                return i
            i += 2
        else:
            i += 1
    return n


def _dc_unit(br, blk, pred: int, ah: int, al: int, dc_table) -> int:
    """One block's DC in a progressive DC scan; returns the new
    predictor."""
    if ah == 0:
        s = _read_symbol(br, dc_table)
        diff = _extend(br.bits(s), s) if s else 0
        pred += diff
        blk[0] = pred << al
    else:
        if br.bit():
            blk[0] = int(blk[0]) | (1 << al)
    return pred


def _ac_first_block(br, blk, ss, se, al, ac_table, eobrun: int) -> int:
    """One block of an AC spectral-selection first scan (Ah=0) with
    EOBn end-of-band runs; returns the remaining EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _read_symbol(br, ac_table)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r < 15:
                eb = (1 << r) - 1
                if r:
                    eb += br.bits(r)
                return eb
            k += 16  # ZRL
        else:
            k += r
            if k > se:
                raise ValueError("AC run past band end")
            blk[k] = _extend(br.bits(s), s) << al
            k += 1
    return 0


def _ac_refine_block(br, blk, ss, se, al, ac_table, eobrun: int) -> int:
    """One block of an AC successive-approximation refinement scan
    (Ah>0): new coefficients arrive as ±1<<Al with runs counted over
    zero-HISTORY positions; already-nonzero coefficients consume one
    correction bit each, in coefficient order (libjpeg
    decode_mcu_AC_refine semantics)."""
    p1, m1 = 1 << al, -(1 << al)
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _read_symbol(br, ac_table)
            r, s = rs >> 4, rs & 0xF
            val = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.bits(r)
                    break
                # ZRL: skip 16 zero-history coefficients below
            else:
                val = p1 if br.bit() else m1
            while k <= se:
                coef = int(blk[k])
                if coef != 0:
                    if br.bit() and (coef & p1) == 0:
                        blk[k] = coef + (p1 if coef >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                blk[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            coef = int(blk[k])
            if coef != 0:
                if br.bit() and (coef & p1) == 0:
                    blk[k] = coef + (p1 if coef >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _progressive_scan(
    payload, pos, comps, coeffs, huff, restart, mcux, mcuy
) -> int:
    """Decode one progressive SOS (header at ``pos``) into the
    per-component coefficient accumulators; returns the position just
    past this scan's entropy data."""
    (seg_len,) = struct.unpack_from(">H", payload, pos)
    body = payload[pos + 2 : pos + seg_len]
    ns = body[0]
    sidx: list[int] = []
    for ci in range(ns):
        cid, tt = body[1 + 2 * ci], body[2 + 2 * ci]
        for i, c in enumerate(comps):
            if c["id"] == cid:
                c["dc"], c["ac"] = tt >> 4, tt & 0xF
                sidx.append(i)
    ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
    ah, al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 0xF
    start = pos + seg_len
    end = _entropy_end(payload, start)
    br = _BitReader(payload[start:end])
    preds = [0] * len(comps)
    eobrun = 0

    def _restart_boundary():
        nonlocal preds, eobrun
        br.align()
        while (
            br.pos + 1 < len(br.data)
            and br.data[br.pos] == 0xFF
            and 0xD0 <= br.data[br.pos + 1] <= 0xD7
        ):
            br.pos += 2
        preds = [0] * len(comps)
        eobrun = 0

    if ss == 0:  # DC scan — interleaved when ns > 1
        if ns > 1:
            for m in range(mcux * mcuy):
                if restart and m and m % restart == 0:
                    _restart_boundary()
                my, mx = divmod(m, mcux)
                for i in sidx:
                    c = comps[i]
                    for vy in range(c["vs"]):
                        for vx in range(c["hs"]):
                            by = my * c["vs"] + vy
                            bx = mx * c["hs"] + vx
                            preds[i] = _dc_unit(
                                br, coeffs[i][by, bx], preds[i],
                                ah, al, huff.get((0, c.get("dc", 0))),
                            )
        else:
            i = sidx[0]
            c = comps[i]
            for b in range(c["nby"] * c["nbx"]):
                if restart and b and b % restart == 0:
                    _restart_boundary()
                by, bx = divmod(b, c["nbx"])
                preds[i] = _dc_unit(
                    br, coeffs[i][by, bx], preds[i],
                    ah, al, huff.get((0, c.get("dc", 0))),
                )
    else:  # AC scan — always single-component, own block grid
        i = sidx[0]
        c = comps[i]
        ac_table = huff[(1, c["ac"])]
        for b in range(c["nby"] * c["nbx"]):
            if restart and b and b % restart == 0:
                _restart_boundary()
            by, bx = divmod(b, c["nbx"])
            blk = coeffs[i][by, bx]
            if ah == 0:
                eobrun = _ac_first_block(br, blk, ss, se, al, ac_table, eobrun)
            else:
                eobrun = _ac_refine_block(
                    br, blk, ss, se, al, ac_table, eobrun
                )
    return end


def _decode_progressive(payload, pos, comps, qts, huff, h, w, restart):
    """Progressive frame: accumulate coefficients across every scan,
    then one vectorized dequant + IDCT + assemble."""
    hmax = max(c["hs"] for c in comps)
    vmax = max(c["vs"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        # padded (interleaved-grid) block dims vs the component's own
        # block dims — non-interleaved scans cover only the latter
        c["bx"], c["by"] = mcux * c["hs"], mcuy * c["vs"]
        cw = -(-(w * c["hs"]) // hmax)
        ch = -(-(h * c["vs"]) // vmax)
        c["nbx"], c["nby"] = -(-cw // 8), -(-ch // 8)
    coeffs = [
        np.zeros((c["by"], c["bx"], 64), np.int32) for c in comps
    ]
    first = True
    while pos < len(payload):
        if first:
            marker = 0xDA  # entered pointing at the first SOS length
            first = False
        else:
            if payload[pos] != 0xFF:
                pos += 1
                continue
            marker = payload[pos + 1]
            pos += 2
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                continue
            if marker == 0xD9:
                break
        if marker == 0xDA:
            pos = _progressive_scan(
                payload, pos, comps, coeffs, huff, restart, mcux, mcuy
            )
            continue
        (seg_len,) = struct.unpack_from(">H", payload, pos)
        body = payload[pos + 2 : pos + seg_len]
        if marker == 0xC4:
            _parse_dht(body, huff)
        elif marker == 0xDB:
            _parse_dqt(body, qts)
        elif marker == 0xDD:
            (restart,) = struct.unpack_from(">H", body, 0)
        pos += seg_len
    planes = []
    for c, cf in zip(comps, coeffs):
        nb = c["by"] * c["bx"]
        zz = cf.reshape(nb, 64)
        nat = np.zeros((nb, 64), np.float64)
        nat[:, _ZIGZAG] = zz
        blocks = nat.reshape(nb, 8, 8) * qts[c["tq"]][None].astype(np.float64)
        px = np.einsum("ij,njk,kl->nil", _DCT.T, blocks, _DCT) + 128.0
        planes.append(
            px.reshape(c["by"], c["bx"], 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(c["by"] * 8, c["bx"] * 8)
        )
    return _assemble_rgb(comps, planes, h, w, hmax, vmax)
