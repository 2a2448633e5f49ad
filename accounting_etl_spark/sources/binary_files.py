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

pdfplumber is not installed in this container: the extractor is
injectable, and the default raises a clear ImportError while the
plumbing (schema, batching, explode) stays real and tested with a
fake extractor.
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
    try:
        import io

        import pdfplumber
    except ImportError as e:  # container has no pdfplumber
        raise ImportError(
            "pdfplumber is not installed; pass a custom extractor to "
            "words_from_pdfs (the rest of the pipeline is"
            " extractor-agnostic)"
        ) from e
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


def words_from_pdfs(
    binary_df: DataFrame, *, extractor: PdfExtractor | None = None
) -> DataFrame:
    """U1: (path, content) → words rows, Arrow-batched per partition."""
    fn = extractor or _pdfplumber_extractor

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
