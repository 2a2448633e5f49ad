"""Progressive JPEG decode — scan-layer equivalence tests.

The test encoder here is an independent implementation of the T.81
entropy/scan layer (bit writer, flat canonical Huffman tables, DC/AC
spectral-selection and successive-approximation scan emitters with
EOBn runs, ZRL, restart markers — the libjpeg encode_mcu_* ordering).
It emits the SAME coefficient grids twice: once as a baseline (SOF0)
stream and once as a multi-scan progressive (SOF2) stream. Decoding
both through ``decode_jpeg`` must give bit-identical RGB — proving
the progressive scan accumulation reconstructs exactly the
coefficients the (independently tested) baseline path sees.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from accounting_etl_spark.operators.jpeg_codec import decode_jpeg

# zigzag order (spec constant, written out independently of the codec)
_ZZ = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


class _W:
    """Entropy bit writer: byte stuffing, 1-padding, raw markers."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def bits(self, v: int, k: int) -> None:
        for i in range(k - 1, -1, -1):
            self.acc = (self.acc << 1) | ((v >> i) & 1)
            self.n += 1
            if self.n == 8:
                b = self.acc & 0xFF
                self.out.append(b)
                if b == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def sym(self, v: int) -> None:
        # flat canonical table: 128 symbols at 8 bits, 128 at 9
        if v < 128:
            self.bits(v, 8)
        else:
            self.bits(256 + (v - 128), 9)

    def align(self) -> None:
        while self.n:
            self.bits(1, 1)

    def marker(self, m: int) -> None:
        self.align()
        self.out += bytes([0xFF, m])


def _flat_dht(tc: int, th: int) -> bytes:
    bits = [0] * 16
    bits[7] = 128  # length 8
    bits[8] = 128  # length 9
    return bytes([(tc << 4) | th]) + bytes(bits) + bytes(range(256))


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _mag(v: int) -> tuple[int, int]:
    if v == 0:
        return 0, 0
    s = abs(v).bit_length()
    return s, v if v > 0 else v + (1 << s) - 1


def _headers(sof_marker: int, h: int, w: int, samps, restart: int) -> bytes:
    out = b"\xff\xd8"
    qt = bytes([0]) + bytes([1] * 64)  # identity quantization, id 0
    out += _seg(0xDB, qt)
    sof = struct.pack(">BHHB", 8, h, w, len(samps))
    for cid, (hs, vs) in enumerate(samps, start=1):
        sof += bytes([cid, (hs << 4) | vs, 0])
    out += _seg(sof_marker, sof)
    out += _seg(0xC4, _flat_dht(0, 0))
    out += _seg(0xC4, _flat_dht(1, 0))
    if restart:
        out += _seg(0xDD, struct.pack(">H", restart))
    return out


def _sos(comp_ids, ss, se, ah, al) -> bytes:
    body = bytes([len(comp_ids)])
    for cid in comp_ids:
        body += bytes([cid, 0x00])
    body += bytes([ss, se, (ah << 4) | al])
    return _seg(0xDA, body)


def _grids(samps, h, w, rng):
    """Per-component zigzag coefficient grids on the padded
    (interleaved) block grid; blocks outside the component's own grid
    stay zero."""
    hmax = max(hs for hs, _ in samps)
    vmax = max(vs for _, vs in samps)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    grids = []
    for hs, vs in samps:
        by, bx = mcuy * vs, mcux * hs
        nby = -(-(-(-(h * vs) // vmax)) // 8)
        nbx = -(-(-(-(w * hs) // hmax)) // 8)
        g = np.zeros((by, bx, 64), np.int32)
        for yy in range(nby):
            for xx in range(nbx):
                g[yy, xx, 0] = int(rng.integers(-200, 201))
                for k in rng.integers(1, 64, size=6):
                    g[yy, xx, int(k)] = int(rng.integers(-31, 32))
        grids.append({"g": g, "by": by, "bx": bx, "nby": nby, "nbx": nbx,
                      "hs": hs, "vs": vs})
    return grids, mcux, mcuy


def _interleaved_units(grids, mcux, mcuy):
    """(comp_index, by, bx) triples in interleaved MCU order."""
    for m in range(mcux * mcuy):
        my, mx = divmod(m, mcux)
        for i, c in enumerate(grids):
            for vy in range(c["vs"]):
                for vx in range(c["hs"]):
                    yield i, my * c["vs"] + vy, mx * c["hs"] + vx


class _Restart:
    def __init__(self, w: _W, interval: int, n_comps: int) -> None:
        self.w, self.interval, self.m = w, interval, 0
        self.count = 0
        self.n_comps = n_comps
        self.preds = [0] * n_comps

    def boundary(self, flush=None) -> None:
        """Call after each unit; emits RSTn between intervals."""
        self.count += 1
        if self.interval and self.count % self.interval == 0:
            if flush:
                flush()
            self.w.marker(0xD0 + self.m % 8)
            self.m += 1
            self.preds = [0] * self.n_comps


def _emit_baseline(grids, mcux, mcuy, restart: int) -> bytes:
    w = _W()
    rst = _Restart(w, restart, len(grids))
    units = list(_interleaved_units(grids, mcux, mcuy))
    per_mcu = sum(c["hs"] * c["vs"] for c in grids)
    for u, (i, by, bx) in enumerate(units):
        blk = grids[i]["g"][by, bx]
        diff = int(blk[0]) - rst.preds[i]
        rst.preds[i] = int(blk[0])
        s, b = _mag(diff)
        w.sym(s)
        w.bits(b, s)
        r = 0
        last = max((k for k in range(1, 64) if blk[k]), default=0)
        for k in range(1, last + 1):
            v = int(blk[k])
            if v == 0:
                r += 1
                continue
            while r > 15:
                w.sym(0xF0)
                r -= 16
            s, b = _mag(v)
            w.sym((r << 4) | s)
            w.bits(b, s)
            r = 0
        if last < 63:
            w.sym(0x00)  # EOB
        if (u + 1) % per_mcu == 0:  # restart counts MCUs
            rst.boundary()
    w.align()
    return bytes(w.out)


class _EobState:
    """Scan-level EOB run + buffered correction bits (libjpeg BE)."""

    def __init__(self, w: _W) -> None:
        self.w = w
        self.run = 0
        self.pending: list[int] = []

    def flush(self) -> None:
        if self.run == 0 and not self.pending:
            return
        if self.run > 0:
            r = self.run.bit_length() - 1
            self.w.sym(r << 4)
            self.w.bits(self.run - (1 << r), r)
        for b in self.pending:
            self.w.bits(b, 1)
        self.run = 0
        self.pending = []


def _emit_dc_first(w, grids, mcux, mcuy, comp_idx, al, restart) -> None:
    rst = _Restart(w, restart, len(grids))
    if len(comp_idx) > 1:
        units = list(_interleaved_units(grids, mcux, mcuy))
        per_mcu = sum(c["hs"] * c["vs"] for c in grids)
    else:
        i = comp_idx[0]
        c = grids[i]
        units = [(i, b // c["nbx"], b % c["nbx"])
                 for b in range(c["nby"] * c["nbx"])]
        per_mcu = 1
    for u, (i, by, bx) in enumerate(units):
        t = int(grids[i]["g"][by, bx, 0]) >> al
        diff = t - rst.preds[i]
        rst.preds[i] = t
        s, b = _mag(diff)
        w.sym(s)
        w.bits(b, s)
        if (u + 1) % per_mcu == 0:
            rst.boundary()
    w.align()


def _emit_dc_refine(w, grids, mcux, mcuy, comp_idx, al, restart) -> None:
    rst = _Restart(w, restart, len(grids))
    units = list(_interleaved_units(grids, mcux, mcuy))
    per_mcu = sum(c["hs"] * c["vs"] for c in grids)
    for u, (i, by, bx) in enumerate(units):
        w.bits((int(grids[i]["g"][by, bx, 0]) >> al) & 1, 1)
        if (u + 1) % per_mcu == 0:
            rst.boundary()
    w.align()


def _emit_ac_first(w, grid, ss, se, al, restart) -> None:
    eob = _EobState(w)
    rst = _Restart(w, restart, 1)
    for b in range(grid["nby"] * grid["nbx"]):
        by, bx = divmod(b, grid["nbx"])
        blk = grid["g"][by, bx]
        r = 0
        for k in range(ss, se + 1):
            v = int(blk[k])
            t = (abs(v) >> al) * (1 if v > 0 else -1)
            if t == 0:
                r += 1
                continue
            eob.flush()
            while r > 15:
                w.sym(0xF0)
                r -= 16
            s, bb = _mag(t)
            w.sym((r << 4) | s)
            w.bits(bb, s)
            r = 0
        if r > 0:
            eob.run += 1
            if eob.run == 0x7FFF:
                eob.flush()
        rst.boundary(flush=eob.flush)
    eob.flush()
    w.align()


def _emit_ac_refine(w, grid, ss, se, al, restart) -> None:
    eob = _EobState(w)
    rst = _Restart(w, restart, 1)
    for b in range(grid["nby"] * grid["nbx"]):
        by, bx = divmod(b, grid["nbx"])
        blk = grid["g"][by, bx]
        r = 0
        local: list[int] = []
        # last newly-nonzero position: ZRLs beyond it fold into the EOB
        last_new = max(
            (k for k in range(ss, se + 1) if abs(int(blk[k])) >> al == 1),
            default=ss - 1,
        )
        for k in range(ss, se + 1):
            v = int(blk[k])
            t = abs(v) >> al
            if t == 0:
                r += 1
                continue
            # ZRLs are flushed at the FIRST nonzero position once the
            # zero-history run exceeds 15 (libjpeg ordering — the
            # decoder's walk consumes buffered bits interleaved with
            # the skipped zeros), but only while within the span of
            # newly-nonzero coefficients
            while r > 15 and k <= last_new:
                eob.flush()
                w.sym(0xF0)
                for bit in local:
                    w.bits(bit, 1)
                local = []
                r -= 16
            if t > 1:
                local.append(t & 1)  # history-nonzero correction bit
                continue
            # newly nonzero at this precision
            eob.flush()
            w.sym((r << 4) | 1)
            w.bits(1 if v > 0 else 0, 1)  # sign
            for bit in local:
                w.bits(bit, 1)
            local = []
            r = 0
        if r > 0 or local:
            eob.run += 1
            eob.pending.extend(local)
            if eob.run == 0x7FFF:
                eob.flush()
        rst.boundary(flush=eob.flush)
    eob.flush()
    w.align()


def _baseline_bytes(samps, h, w, grids, mcux, mcuy, restart) -> bytes:
    out = _headers(0xC0, h, w, samps, restart)
    out += _sos(list(range(1, len(samps) + 1)), 0, 63, 0, 0)
    out += _emit_baseline(grids, mcux, mcuy, restart)
    return out + b"\xff\xd9"


def _progressive_bytes(samps, h, w, grids, mcux, mcuy, restart) -> bytes:
    all_ids = list(range(1, len(samps) + 1))
    out = _headers(0xC2, h, w, samps, restart)
    wr = _W()

    def scan(sos: bytes, emit) -> None:
        nonlocal out
        wr.__init__()
        emit(wr)
        out += sos + bytes(wr.out)

    # DC first (Al=1), interleaved over every component
    scan(_sos(all_ids, 0, 0, 0, 1),
         lambda w_: _emit_dc_first(w_, grids, mcux, mcuy,
                                   list(range(len(grids))), 1, restart))
    # AC first scans, split bands for component 0
    scan(_sos([1], 1, 5, 0, 1),
         lambda w_: _emit_ac_first(w_, grids[0], 1, 5, 1, restart))
    for ci in range(1, len(grids)):
        scan(_sos([ci + 1], 1, 63, 0, 1),
             lambda w_, ci=ci: _emit_ac_first(w_, grids[ci], 1, 63, 1,
                                              restart))
    scan(_sos([1], 6, 63, 0, 1),
         lambda w_: _emit_ac_first(w_, grids[0], 6, 63, 1, restart))
    # DC refinement (Ah=1 → Al=0), interleaved
    scan(_sos(all_ids, 0, 0, 1, 0),
         lambda w_: _emit_dc_refine(w_, grids, mcux, mcuy,
                                    list(range(len(grids))), 0, restart))
    # AC refinement scans
    scan(_sos([1], 1, 5, 1, 0),
         lambda w_: _emit_ac_refine(w_, grids[0], 1, 5, 0, restart))
    scan(_sos([1], 6, 63, 1, 0),
         lambda w_: _emit_ac_refine(w_, grids[0], 6, 63, 0, restart))
    for ci in range(1, len(grids)):
        scan(_sos([ci + 1], 1, 63, 1, 0),
             lambda w_, ci=ci: _emit_ac_refine(w_, grids[ci], 1, 63, 0,
                                               restart))
    return out + b"\xff\xd9"


@pytest.mark.parametrize(
    "samps,h,w,restart,seed",
    [
        ([(1, 1), (1, 1), (1, 1)], 24, 24, 0, 7),       # 4:4:4 aligned
        ([(2, 2), (1, 1), (1, 1)], 35, 35, 0, 11),      # 4:2:0 cropped
        ([(1, 1)], 40, 33, 5, 13),                      # gray + restarts
        ([(2, 1), (1, 1), (1, 1)], 17, 50, 4, 17),      # 4:2:2 + restarts
    ],
)
def test_progressive_equals_baseline(samps, h, w, restart, seed):
    rng = np.random.default_rng(seed)
    grids, mcux, mcuy = _grids(samps, h, w, rng)
    base = _baseline_bytes(samps, h, w, grids, mcux, mcuy, restart)
    prog = _progressive_bytes(samps, h, w, grids, mcux, mcuy, restart)
    a = decode_jpeg(base)
    b = decode_jpeg(prog)
    assert a is not None and b is not None
    assert a.shape == (h, w, 3) and b.shape == (h, w, 3)
    assert np.array_equal(a, b)


def test_eobn_runs_across_blocks():
    """A mostly-empty component forces EOBn runs spanning many blocks
    in both first and refinement AC scans."""
    samps = [(1, 1)]
    h = w = 64  # 8x8 = 64 blocks
    rng = np.random.default_rng(3)
    grids, mcux, mcuy = _grids(samps, h, w, rng)
    g = grids[0]["g"]
    g[:, :, 1:] = 0  # wipe all AC...
    g[2, 3, 17] = -21  # ...except one mid-grid block
    g[5, 1, 2] = 9
    base = _baseline_bytes(samps, h, w, grids, mcux, mcuy, 0)
    prog = _progressive_bytes(samps, h, w, grids, mcux, mcuy, 0)
    assert np.array_equal(decode_jpeg(base), decode_jpeg(prog))


def test_progressive_detected_not_refused():
    """SOF2 streams decode instead of raising NotImplementedError."""
    samps = [(1, 1)]
    rng = np.random.default_rng(1)
    grids, mcux, mcuy = _grids(samps, 16, 16, rng)
    prog = _progressive_bytes(samps, 16, 16, grids, mcux, mcuy, 0)
    out = decode_jpeg(prog)
    assert out is not None and out.shape == (16, 16, 3)
