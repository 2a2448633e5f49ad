"""Binary-file sources (S1) and the PDF word-extraction UDF (U1).

S1 (reference main.py:65-69, ``rglob('*.pdf')``) → the binaryFile
source with recursive lookup; provenance rides along as ``path``.

U1 (reference pdf_parser.py:106-158) → the engine's one mandatory
Python UDF: pdfplumber inside Arrow-batched ``mapInPandas``, emitting
one row per word with its bbox. The page-text predicate (P1,
pdf_parser.py:108-110) is applied INSIDE the UDF before word
extraction — Catalyst can't push filters into Python, so the
reference's manual short-circuit is preserved by construction
(SURVEY §4).

The extractor is injectable; the default uses pdfplumber when
installed and otherwise falls back to the built-in pure-stdlib PDF
engine (:mod:`accounting_etl_spark.sources.pdf_codec`), so real PDF
byte streams parse end-to-end in either environment.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

WORDS_SCHEMA = (
    "path string, page int, text string, "
    "x0 double, x1 double, top double, bottom double"
)

# bytes -> list of (page, text, x0, x1, top, bottom)
PdfExtractor = Callable[[bytes], list[tuple]]


def scan_binary_files(
    spark: SparkSession, root: str, *, glob: str = "*.pdf"
) -> DataFrame:
    """S1: recursive binary scan; (path, modificationTime, length,
    content). Column pruning matters at scale: count-only queries must
    not deserialize ``content`` (Catalyst prunes it from this scan)."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
        .load(root)
    )


def _pdfplumber_extractor(payload: bytes) -> list[tuple]:
    import io

    import pdfplumber

    out: list[tuple] = []
    with pdfplumber.open(io.BytesIO(payload)) as pdf:
        for pageno, page in enumerate(pdf.pages, start=1):
            text = page.extract_text()
            # P1: cheap page predicate BEFORE expensive word extraction
            if not text or "Transaction Details" not in text:
                continue
            for w in page.extract_words():
                out.append(
                    (pageno, w["text"], float(w["x0"]), float(w["x1"]),
                     float(w["top"]), float(w["bottom"]))
                )
    return out


def _minipdf_extractor(payload: bytes) -> list[tuple]:
    """Pure-stdlib extraction (sources/pdf_codec.py) with the same P1
    page predicate as the pdfplumber path."""
    from . import pdf_codec

    words = pdf_codec.extract_words(payload)
    page_text: dict[int, list[str]] = {}
    for page, text, *_ in words:
        page_text.setdefault(page, []).append(text)
    keep = {
        p for p, ts in page_text.items()
        if "Transaction Details" in " ".join(ts)
    }
    return [w for w in words if w[0] in keep]


def default_extractor(payload: bytes) -> list[tuple]:
    """pdfplumber when installed, else the built-in mini PDF engine —
    real PDF bytes parse either way; no environment gating."""
    try:
        return _pdfplumber_extractor(payload)
    except ImportError:
        return _minipdf_extractor(payload)


def words_from_pdfs(
    binary_df: DataFrame, *, extractor: PdfExtractor | None = None
) -> DataFrame:
    """U1: (path, content) → words rows, Arrow-batched per partition."""
    fn = extractor or default_extractor

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                for (page, text, x0, x1, top, bottom) in fn(bytes(content)):
                    rows.append(
                        {"path": path, "page": page, "text": text,
                         "x0": x0, "x1": x1, "top": top, "bottom": bottom}
                    )
            yield pd.DataFrame(
                rows,
                columns=["path", "page", "text", "x0", "x1", "top", "bottom"],
            )

    return binary_df.select("path", "content").mapInPandas(
        extract, schema=WORDS_SCHEMA
    )
