"""HTML main-text extraction + link harvest — stdlib ``html.parser``.

The crawl-to-corpus stage between the WARC scan
(``sources/warc.py``) and the text-quality battery
(``queries/text.py``): strip markup, drop boilerplate, keep the main
content, harvest outlinks for the URL/host graph
(``operators/url_ops.py``, ``operators/graph.py::pagerank_int``).

Boilerplate policy (a jusText/trafilatura-style line-density rule,
kept deterministic and integer-friendly):

- content inside ``<script>/<style>/<noscript>/<template>/<svg>`` and
  ``<head>`` (except ``<title>``) is never text;
- blocks inside ``<nav>/<header>/<footer>/<aside>`` are boilerplate;
- a block whose *link-character density* exceeds ``max_link_density``
  (anchor chars * den > total chars * num, integer math) is
  boilerplate — link lists and menus drop out even without semantic
  tags.

``extract_text`` is the pure-Python core (unit-testable without
Spark); :func:`extract_html` is the one-pass Arrow ``mapInPandas``
wrapper — map-side only, no shuffle, scales with executors.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Optional
from urllib.parse import urljoin

_SKIP = {"script", "style", "noscript", "template", "svg"}
_BOILER = {"nav", "header", "footer", "aside"}
_BLOCK = {
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
    "table", "tr", "td", "th", "br", "article", "section", "main",
    "blockquote", "pre", "title", "body",
}
_VOID = {"br", "img", "hr", "meta", "link", "input"}


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[str, bool, int, int]] = []
        self.links: list[tuple[str, bool]] = []
        self.title: Optional[str] = None
        self._buf: list[str] = []
        self._buf_link_chars = 0
        self._skip = 0
        self._boiler = 0
        self._in_head = 0
        self._in_title = False
        self._in_a = 0
        self._title_buf: list[str] = []

    def _flush(self) -> None:
        text = "".join(self._buf).strip()
        link_chars = self._buf_link_chars
        self._buf = []
        self._buf_link_chars = 0
        if text:
            self.blocks.append(
                (text, self._boiler > 0, link_chars, len(text))
            )

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP:
            self._skip += 1
            return
        if tag == "head":
            self._in_head += 1
        if tag == "title":
            self._in_title = True
            return
        if tag in _BOILER:
            self._flush()
            self._boiler += 1
            return
        if tag in _BLOCK:
            self._flush()
        if tag == "a":
            self._in_a += 1
            href = dict(attrs).get("href")
            if href:
                self.links.append((href, self._boiler > 0))
        if tag in _VOID and tag in _BLOCK:
            self._flush()

    def handle_startendtag(self, tag, attrs):
        self.handle_starttag(tag, attrs)
        if tag not in _VOID:
            self.handle_endtag(tag)

    def handle_endtag(self, tag):
        if tag in _SKIP:
            self._skip = max(0, self._skip - 1)
            return
        if tag == "head":
            self._in_head = max(0, self._in_head - 1)
        if tag == "title":
            self._in_title = False
            if self.title is None:
                self.title = "".join(self._title_buf).strip()
            return
        if tag in _BOILER:
            self._flush()
            self._boiler = max(0, self._boiler - 1)
            return
        if tag == "a":
            self._in_a = max(0, self._in_a - 1)
        if tag in _BLOCK:
            self._flush()

    def handle_data(self, data):
        if self._in_title:
            self._title_buf.append(data)
            return
        if self._skip or self._in_head:
            return
        self._buf.append(data)
        if self._in_a:
            self._buf_link_chars += len(data)


def extract_text(
    html: str,
    base_url: Optional[str] = None,
    max_link_density: tuple[int, int] = (1, 2),
) -> dict:
    """Parse one document. Returns ``title``, main ``text``
    (newline-joined content blocks), ``n_blocks`` (content blocks
    kept), ``links`` (all outlinks, resolved against ``base_url``),
    ``content_links`` (outlinks from non-boilerplate markup only).

    A block is dropped as boilerplate when it sits under a
    boilerplate tag OR ``link_chars * den > total_chars * num``
    (integer comparison — no float thresholds, same rule style as the
    Gopher battery in ``queries/text.py``).
    """
    p = _Extractor()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass  # graceful-skip: keep whatever was collected
    p._flush()
    num, den = max_link_density
    kept = [
        t
        for (t, boiler, lc, n) in p.blocks
        if not boiler and not (lc * den > n * num)
    ]
    resolve = (lambda h: urljoin(base_url, h)) if base_url else (lambda h: h)
    return {
        "title": p.title or "",
        "text": "\n".join(kept),
        "n_blocks": len(kept),
        "links": [resolve(h) for (h, _b) in p.links],
        "content_links": [resolve(h) for (h, b) in p.links if not b],
    }


_OUT_SCHEMA_SUFFIX = (
    "title string, text string, n_blocks int, "
    "links array<string>, content_links array<string>"
)


def extract_html(
    df,
    html_col: str = "html",
    base_col: Optional[str] = None,
    keep_cols: Optional[list[str]] = None,
    max_link_density: tuple[int, int] = (1, 2),
):
    """One Arrow ``mapInPandas`` pass adding the extraction columns to
    ``keep_cols`` (default: every column except ``html_col`` — the
    raw markup is dropped on the way out so the shuffle-facing row
    shrinks to text size)."""
    import pandas as pd

    keep = keep_cols or [c for c in df.columns if c != html_col]
    in_cols = list(dict.fromkeys(keep + [html_col] + ([base_col] if base_col else [])))
    fields = ", ".join(f"{c} {df.schema[c].dataType.simpleString()}" for c in keep)
    schema = f"{fields}, {_OUT_SCHEMA_SUFFIX}" if fields else _OUT_SCHEMA_SUFFIX

    def run(batches):
        for pdf in batches:
            outs = [
                extract_text(
                    h,
                    base_url=(pdf[base_col].iloc[i] if base_col else None),
                    max_link_density=max_link_density,
                )
                for i, h in enumerate(pdf[html_col])
            ]
            res = pdf[keep].copy()
            res["title"] = [o["title"] for o in outs]
            res["text"] = [o["text"] for o in outs]
            res["n_blocks"] = pd.Series(
                [o["n_blocks"] for o in outs], dtype="int32"
            )
            res["links"] = [o["links"] for o in outs]
            res["content_links"] = [o["content_links"] for o in outs]
            yield res

    return df.select(*in_cols).mapInPandas(run, schema)
