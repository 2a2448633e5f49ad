"""Pure-stdlib PDF writer + positional word extractor.

Closes the "pdfplumber is absent so no real PDF bytes were ever
parsed" gap (reference pdf_parser.py:106-158): this module renders
real PDF files (xref table, Flate-compressed content streams, page
tree) and parses them back into the same ``(page, text, x0, x1, top,
bottom)`` word tuples pdfplumber's ``extract_words()`` yields, using
only ``zlib``/``re``. It is a genuine (if small) PDF text engine —
it tokenizes content streams and interprets the text-object operators
(BT/ET, Tf, Td/TD/Tm/T*/TL, Tc/Tw, Tj/TJ/') with real font metrics —
not a lookup keyed to our own writer. The writer and reader are
tested against each other AND the reader against hand-assembled
third-party-style files (uncompressed streams, TJ kerning arrays,
multiple content streams per page).

Coordinate convention matches pdfplumber: ``top``/``bottom`` measure
DOWN from the top of the page (top = page_height - glyph_top), so the
statement pipeline's geometry joins (|Δtop| < 2, anchor-gap row
clustering) run unchanged on words from either extractor.

Everything here is from the public PDF 1.4 spec and the public Adobe
core-14 AFM metrics (Courier 600/1000 em fixed-pitch; Helvetica
per-char widths).
"""

from __future__ import annotations

import re
import zlib

# --- public Adobe core-14 metrics (AFM), 1/1000 em units ------------

_COURIER_WIDTH = 600  # fixed pitch, every glyph

# Helvetica widths for printable ASCII 32..126 (public AFM data).
_HELVETICA_WIDTHS = [
    278, 278, 355, 556, 556, 889, 667, 191, 333, 333, 389, 584, 278,
    333, 278, 278, 556, 556, 556, 556, 556, 556, 556, 556, 556, 556,
    278, 278, 584, 584, 584, 556, 1015, 667, 667, 722, 722, 667, 611,
    778, 722, 278, 500, 667, 556, 833, 722, 778, 667, 778, 722, 667,
    611, 722, 667, 944, 667, 667, 611, 278, 278, 278, 469, 556, 333,
    556, 556, 500, 556, 556, 278, 556, 556, 222, 222, 500, 222, 833,
    556, 556, 556, 556, 333, 500, 278, 556, 500, 722, 500, 500, 500,
    334, 260, 334, 584,
]

# Vertical glyph extent as a fraction of font size (Courier AFM
# ascender 629 / descender -157; close enough for Helvetica too —
# the pipeline only needs internally-consistent tops for proximity
# grouping, never absolute typographic truth).
_ASCENT = 0.629
_DESCENT = 0.157


def _char_width(ch: str, base_font: str) -> float:
    if "Courier" in base_font:
        return _COURIER_WIDTH
    o = ord(ch)
    if "Helvetica" in base_font or "Arial" in base_font:
        if 32 <= o <= 126:
            return _HELVETICA_WIDTHS[o - 32]
        return 556.0
    return 500.0


# ===================== writer ========================================

LETTER = (612.0, 792.0)  # 8.5x11in in points


def write_pdf(
    pages: list[list[tuple]],
    *,
    compress: bool = True,
    page_size: tuple[float, float] = LETTER,
    font: str = "Courier",
) -> bytes:
    """Render ``pages`` to PDF bytes.

    Each page is a list of ``(text, x, baseline_y_from_top, size)``
    draw commands; y measures DOWN from the page top (same axis the
    extractor reports), so fixtures read naturally. One Tm per draw
    command — absolute positioning, no reliance on line state.
    """
    w, h = page_size
    objs: list[bytes] = []  # 1-indexed

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)

    font_id = add(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /" +
        font.encode("ascii") + b" >>"
    )

    page_ids: list[int] = []
    content_ids: list[int] = []
    for cmds in pages:
        parts = []
        for text, x, y_top, size in cmds:
            esc = (
                text.replace("\\", r"\\").replace("(", r"\(")
                .replace(")", r"\)")
            )
            parts.append(
                b"BT /F1 %.2f Tf 1 0 0 1 %.2f %.2f Tm (%s) Tj ET"
                % (size, x, h - y_top, esc.encode("latin-1"))
            )
        body = b"\n".join(parts)
        stream = zlib.compress(body) if compress else body
        filt = b"/Filter /FlateDecode " if compress else b""
        content_ids.append(add(
            b"<< " + filt + b"/Length %d >>\nstream\n" % len(stream)
            + stream + b"\nendstream"
        ))
        page_ids.append(0)  # placeholder, patched below

    pages_id = len(objs) + len(pages) + 1  # after page objs
    for i, cid in enumerate(content_ids):
        page_ids[i] = add(
            b"<< /Type /Page /Parent %d 0 R /MediaBox [0 0 %.1f %.1f] "
            b"/Resources << /Font << /F1 %d 0 R >> >> /Contents %d 0 R >>"
            % (pages_id, w, h, font_id, cid)
        )
    kids = b" ".join(b"%d 0 R" % p for p in page_ids)
    assert add(
        b"<< /Type /Pages /Kids [" + kids + b"] /Count %d >>"
        % len(page_ids)
    ) == pages_id
    catalog_id = add(b"<< /Type /Catalog /Pages %d 0 R >>" % pages_id)

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root %d 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, catalog_id, xref_at)
    )
    return bytes(out)


# ===================== reader ========================================

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b", re.S)
_STREAM_RE = re.compile(rb"stream\r?\n")


def _parse_objects(payload: bytes) -> dict[int, bytes]:
    """Scan-parse ``N G obj ... endobj`` bodies (robust to stale or
    absent xref tables — linearized files scan fine too)."""
    objs: dict[int, bytes] = {}
    for m in _OBJ_RE.finditer(payload):
        start = m.end()
        # find matching endobj, skipping stream payloads which may
        # contain the token bytes by accident
        sm = _STREAM_RE.search(payload, start)
        end = payload.find(b"endobj", start)
        if sm is not None and end != -1 and sm.start() < end:
            es = payload.find(b"endstream", sm.end())
            if es != -1:
                end = payload.find(b"endobj", es)
        if end == -1:
            continue
        objs[int(m.group(1))] = payload[start:end]
    # PDF 1.5+ object streams: objects packed inside a /Type /ObjStm
    # stream are invisible to the top-level scan — expand them. The
    # stream begins with /N pairs of "objnum offset" (offsets relative
    # to /First); compressed objects never contain streams themselves,
    # so a body slice is the whole object.
    for body in list(objs.values()):
        d = _dict_of(body)
        if b"/ObjStm" not in d:
            continue
        try:
            data = _stream_of(body)
            nm = re.search(rb"/N\s+(\d+)", d)
            fm = re.search(rb"/First\s+(\d+)", d)
            if data is None or nm is None or fm is None:
                continue
            n, first = int(nm.group(1)), int(fm.group(1))
            header = data[:first].split()
            pairs = [
                (int(header[2 * i]), int(header[2 * i + 1]))
                for i in range(n)
            ]
            for i, (num, off) in enumerate(pairs):
                end_off = (
                    pairs[i + 1][1] if i + 1 < len(pairs) else len(data) - first
                )
                objs.setdefault(num, data[first + off:first + end_off])
        except (ValueError, IndexError, zlib.error):
            continue  # malformed object stream: skip, keep scanning
    return objs


def _dict_of(body: bytes) -> bytes:
    """The top-level << ... >> slice of an object body."""
    i = body.find(b"<<")
    if i == -1:
        return b""
    depth, j = 0, i
    while j < len(body) - 1:
        if body[j:j + 2] == b"<<":
            depth += 1
            j += 2
        elif body[j:j + 2] == b">>":
            depth -= 1
            j += 2
            if depth == 0:
                return body[i:j]
        else:
            j += 1
    return body[i:]


def _stream_of(body: bytes) -> bytes | None:
    sm = _STREAM_RE.search(body)
    if sm is None:
        return None
    es = body.rfind(b"endstream")
    raw = body[sm.end():es]
    if raw.endswith(b"\r\n"):
        raw = raw[:-2]
    elif raw.endswith(b"\n") or raw.endswith(b"\r"):
        raw = raw[:-1]
    if b"/FlateDecode" in _dict_of(body):
        raw = zlib.decompress(raw)
    return raw


def _refs(d: bytes, key: bytes) -> list[int]:
    """Indirect references under /key — single ref or array."""
    m = re.search(re.escape(key) + rb"\s*\[(.*?)\]", d, re.S)
    if m:
        return [int(x) for x in re.findall(rb"(\d+)\s+\d+\s+R", m.group(1))]
    m = re.search(re.escape(key) + rb"\s*(\d+)\s+\d+\s+R", d)
    return [int(m.group(1))] if m else []


def _page_height(d: bytes) -> float:
    m = re.search(
        rb"/MediaBox\s*\[\s*[\d.+-]+\s+[\d.+-]+\s+[\d.+-]+\s+([\d.+-]+)",
        d,
    )
    return float(m.group(1)) if m else LETTER[1]


def _page_fonts(d: bytes, objs: dict[int, bytes]) -> dict[bytes, str]:
    """Resource font key (e.g. b'F1') -> BaseFont name."""
    fonts: dict[bytes, str] = {}
    m = re.search(rb"/Font\s*<<(.*?)>>", d, re.S)
    src = m.group(1) if m else b""
    for fm in re.finditer(rb"/(\w+)\s+(\d+)\s+\d+\s+R", src):
        fbody = objs.get(int(fm.group(2)), b"")
        bm = re.search(rb"/BaseFont\s*/([\w+-]+)", fbody)
        fonts[fm.group(1)] = (
            bm.group(1).decode("ascii") if bm else "Helvetica"
        )
    # inline (non-ref) font dicts
    for fm in re.finditer(rb"/(\w+)\s*<<[^>]*?/BaseFont\s*/([\w+-]+)", src):
        fonts[fm.group(1)] = fm.group(2).decode("ascii")
    return fonts


_PDF_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _unescape(raw: bytes) -> str:
    out = bytearray()
    i = 0
    while i < len(raw):
        c = raw[i:i + 1]
        if c == b"\\" and i + 1 < len(raw):
            nxt = raw[i + 1:i + 2]
            if nxt in _PDF_ESCAPES:
                out += _PDF_ESCAPES[nxt]
                i += 2
                continue
            om = re.match(rb"\\([0-7]{1,3})", raw[i:])
            if om:
                out.append(int(om.group(1), 8))
                i += 1 + len(om.group(1))
                continue
            if nxt in (b"\r", b"\n"):
                # backslash-EOL is a line continuation: both chars
                # vanish (PDF 32000-1 §7.3.4.2); \r\n counts as one EOL
                i += 2
                if nxt == b"\r" and raw[i:i + 1] == b"\n":
                    i += 1
                continue
            i += 1  # lone backslash: drop
            continue
        out += c
        i += 1
    return out.decode("latin-1")


_TOKEN_RE = re.compile(
    rb"\((?:[^()\\]|\\.)*\)"      # literal string
    rb"|<[0-9A-Fa-f\s]*>"          # hex string
    rb"|\[|\]"
    rb"|/[^\s/\[\]()<>{}]+"        # name
    rb"|[-+]?[\d.]+"               # number
    rb"|[A-Za-z'\"*]+",            # operator
    re.S,  # a literal string may span lines (\<EOL> continuation)
)


class _TextState:
    __slots__ = (
        "x", "y", "lx", "ly", "size", "font", "tl", "tc", "tw",
        "scale", "vscale", "rot",
    )

    def __init__(self) -> None:
        self.x = self.y = 0.0    # current point (text space ~ user space)
        self.lx = self.ly = 0.0  # line start
        self.size = 12.0
        self.font = "Helvetica"
        self.tl = 0.0            # leading
        self.tc = 0.0            # char spacing
        self.tw = 0.0            # word spacing
        self.scale = 1.0         # Tm horizontal scale (a)
        self.vscale = 1.0        # Tm vertical scale (d)
        self.rot = False         # Tm has rotation/shear: skip emission


def _emit_string(
    s: str, st: _TextState, page_h: float, words: list[list]
) -> None:
    """Advance the cursor through ``s`` char by char, flushing maximal
    non-space runs as word fragments [text, x0, x1, y, size].

    Rotated/sheared text matrices are not laid out — emission is
    skipped (graceful skip, the word grid stays uncorrupted); pure
    scale+translate matrices scale advances and the effective size.
    """
    if st.rot:
        return
    run: list[str] = []
    run_x0 = st.x
    for ch in s:
        adv = (
            _char_width(ch, st.font) / 1000.0 * st.size + st.tc
        ) * st.scale
        if ch == " ":
            adv += st.tw * st.scale
            if run:
                words.append(
                    ["".join(run), run_x0, st.x, st.y, st.size * st.vscale]
                )
                run = []
            st.x += adv
            run_x0 = st.x
        else:
            if not run:
                run_x0 = st.x
            run.append(ch)
            st.x += adv
    if run:
        words.append(
            ["".join(run), run_x0, st.x, st.y, st.size * st.vscale]
        )


def _words_from_content(
    content: bytes, fonts: dict[bytes, str], page_h: float
) -> list[tuple]:
    """Interpret the text operators of one page's content stream(s)."""
    frags: list[list] = []  # [text, x0, x1, baseline_y] user space
    st = _TextState()
    stack: list = []  # operand stack
    for m in _TOKEN_RE.finditer(content):
        tok = m.group(0)
        c0 = tok[:1]
        if c0 == b"(":
            stack.append(("str", _unescape(tok[1:-1])))
        elif c0 == b"<" and tok != b"<<":
            hx = re.sub(rb"\s", b"", tok[1:-1])
            if len(hx) % 2:
                hx += b"0"
            stack.append(("str", bytes.fromhex(hx.decode()).decode("latin-1")))
        elif c0 == b"/":
            stack.append(("name", tok[1:]))
        elif c0 in b"[]":
            stack.append(("mark", tok))
        elif re.fullmatch(rb"[-+]?[\d.]+", tok):
            stack.append(("num", float(tok)))
        else:  # operator
            op = tok
            if op == b"BT":
                st.x = st.y = st.lx = st.ly = 0.0
                st.scale = st.vscale = 1.0
                st.rot = False
                stack.clear()
            elif op == b"Tf" and len(stack) >= 2:
                st.size = stack[-1][1]
                key = stack[-2][1]
                st.font = fonts.get(key, "Helvetica")
                stack.clear()
            elif op == b"Td" and len(stack) >= 2:
                st.lx += stack[-2][1] * st.scale
                st.ly += stack[-1][1] * st.vscale
                st.x, st.y = st.lx, st.ly
                stack.clear()
            elif op == b"TD" and len(stack) >= 2:
                st.tl = -stack[-1][1]
                st.lx += stack[-2][1] * st.scale
                st.ly += stack[-1][1] * st.vscale
                st.x, st.y = st.lx, st.ly
                stack.clear()
            elif op == b"Tm" and len(stack) >= 6:
                a, b_ = stack[-6][1], stack[-5][1]
                c, d = stack[-4][1], stack[-3][1]
                st.lx = stack[-2][1]
                st.ly = stack[-1][1]
                st.x, st.y = st.lx, st.ly
                # pure scale+translate is laid out; rotation/shear is
                # recognized and SKIPPED (not mis-placed) until the
                # next Tm/BT resets the matrix
                st.rot = abs(b_) > 1e-9 or abs(c) > 1e-9
                st.scale = a if not st.rot else 1.0
                st.vscale = d if not st.rot else 1.0
                stack.clear()
            elif op == b"TL" and stack:
                st.tl = stack[-1][1]
                stack.clear()
            elif op == b"Tc" and stack:
                st.tc = stack[-1][1]
                stack.clear()
            elif op == b"Tw" and stack:
                st.tw = stack[-1][1]
                stack.clear()
            elif op == b"T*":
                st.ly -= st.tl * st.vscale
                st.x, st.y = st.lx, st.ly
                stack.clear()
            elif op == b"Tj" and stack and stack[-1][0] == "str":
                _emit_string(stack[-1][1], st, page_h, frags)
                stack.clear()
            elif op == b"'" and stack and stack[-1][0] == "str":
                st.ly -= st.tl * st.vscale
                st.x, st.y = st.lx, st.ly
                _emit_string(stack[-1][1], st, page_h, frags)
                stack.clear()
            elif op == b"TJ":
                # [ (str) num (str) ... ] — numbers kern x by
                # -n/1000 * size
                items: list = []
                while stack and stack[-1] != ("mark", b"["):
                    items.append(stack.pop())
                if stack:
                    stack.pop()
                for kind, val in reversed(items):
                    if kind == "num":
                        st.x -= val / 1000.0 * st.size * st.scale
                    elif kind == "str":
                        _emit_string(val, st, page_h, frags)
                stack.clear()
            else:
                stack.clear()  # unhandled operator consumes operands

    # merge fragments that abut on the same baseline (TJ kerning splits
    # one visual word into pieces), then convert to top-down coords
    frags.sort(key=lambda f: (round(-f[3], 3), f[1]))
    merged: list[list] = []
    for text, x0, x1, y, size in frags:
        if (
            merged
            and abs(merged[-1][3] - y) < 1e-6
            and abs(merged[-1][2] - x0) < 0.35
        ):
            merged[-1][0] += text
            merged[-1][2] = x1
            merged[-1][4] = max(merged[-1][4], size)
        else:
            merged.append([text, x0, x1, y, size])
    return [
        (text, x0, x1,
         page_h - (y + _ASCENT * size), page_h - (y - _DESCENT * size))
        for text, x0, x1, y, size in merged
    ]


def extract_words(payload: bytes) -> list[tuple]:
    """pdfplumber-shaped extraction: ``(page, text, x0, x1, top,
    bottom)`` per word, 1-indexed pages in document order."""
    objs = _parse_objects(payload)
    result: list[tuple] = []
    # page tree: find the /Type /Pages roots and walk /Kids in order;
    # fall back to document-order /Type /Page scan
    page_ids: list[int] = []
    for oid, body in objs.items():
        d = _dict_of(body)
        if re.search(rb"/Type\s*/Pages\b", d):
            page_ids.extend(_refs(d, b"/Kids"))
    if not page_ids:
        page_ids = [
            oid for oid, body in sorted(objs.items())
            if re.search(rb"/Type\s*/Page\b", _dict_of(body))
        ]
    pageno = 0
    for pid in page_ids:
        body = objs.get(pid)
        if body is None:
            continue
        d = _dict_of(body)
        if not re.search(rb"/Type\s*/Page\b", d):
            continue
        pageno += 1
        h = _page_height(d)
        fonts = _page_fonts(d, objs)
        content = b""
        for cid in _refs(d, b"/Contents"):
            try:
                s = _stream_of(objs.get(cid, b""))
            except zlib.error:
                s = None  # corrupt Flate payload: skip this stream
            if s:
                content += s + b"\n"
        for text, x0, x1, top, bottom in _words_from_content(
            content, fonts, h
        ):
            result.append((pageno, text, x0, x1, top, bottom))
    return result


def extract_text(payload: bytes) -> list[str]:
    """Plain text per page (words joined in reading order) — the P1
    page predicate ("Transaction Details" in text) runs on this."""
    pages: dict[int, list[tuple]] = {}
    for page, text, x0, x1, top, bottom in extract_words(payload):
        pages.setdefault(page, []).append((top, x0, text))
    out = []
    for page in sorted(pages):
        ws = sorted(pages[page])
        out.append(" ".join(t for _, _, t in ws))
    return out
