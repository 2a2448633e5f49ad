"""Reference-derived micro-fixtures (FIXTURES.md §B), defined ONCE as
Python literals and rendered to BOTH a Spark DataFrame and a DuckDB
``VALUES`` clause — the single source of truth that lets the
extraction pipeline be oracle-checked end-to-end.

The word geometry replicates the Wells-Fargo statement layout the
reference parses (reference pdf_parser.py:72-84,160-331): the
same-line Credits/Charges header pair (plus an Account-Summary decoy
on different lines), the Trans/Post/Reference sub-header, charge and
credit rows keyed by amount right-edge vs the column threshold,
payment rows, amounts inside descriptions, sub-4-word footers,
subtotal rows failing the date check, and ±-jitter clusters that must
stay within one row while >=3pt gaps split rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# (path, page, text, x0, x1, top, bottom)
WORDS_COLUMNS = ("path", "page", "text", "x0", "x1", "top", "bottom")
WORDS_DDL = (
    "path string, page int, text string, "
    "x0 double, x1 double, top double, bottom double"
)

WORDS_ROWS: list[tuple] = [
    # ---- stmt1.pdf page 1 ------------------------------------------------
    # Account Summary decoy: Credits/Charges on DIFFERENT lines (no pair)
    ("stmt1.pdf", 1, "Credits", 50.0, 90.0, 100.0, 110.0),
    ("stmt1.pdf", 1, "Charges", 50.0, 92.0, 120.0, 130.0),
    # Transaction Details column headers: SAME line (|dtop|<2, chg.x1>crd.x1)
    ("stmt1.pdf", 1, "Credits", 450.0, 501.6, 200.0, 210.0),
    ("stmt1.pdf", 1, "Charges", 540.0, 572.3, 200.5, 210.5),
    # sub-header row: Trans Post Reference Number  -> header_top = 210.0
    ("stmt1.pdf", 1, "Trans", 40.0, 60.0, 210.0, 218.0),
    ("stmt1.pdf", 1, "Post", 80.0, 95.0, 210.8, 218.8),
    ("stmt1.pdf", 1, "Reference", 120.0, 160.0, 211.0, 219.0),
    ("stmt1.pdf", 1, "Number", 165.0, 195.0, 211.2, 219.2),
    # Row A: plain charge (amount x1=571 > threshold 536.95)
    ("stmt1.pdf", 1, "01/03", 40.0, 58.0, 220.0, 228.0),
    ("stmt1.pdf", 1, "01/03", 80.0, 98.0, 220.0, 228.0),
    ("stmt1.pdf", 1, "2466ABCD", 120.0, 170.0, 220.0, 228.0),
    ("stmt1.pdf", 1, "AMAZON", 200.0, 240.0, 220.0, 228.0),
    ("stmt1.pdf", 1, "MKTPL", 245.0, 280.0, 220.0, 228.0),
    ("stmt1.pdf", 1, "39.12", 550.0, 571.0, 220.9, 228.9),
    # Row B: credit (amount x1=501 < threshold) -> negative amount
    ("stmt1.pdf", 1, "01/05", 40.0, 58.0, 235.0, 243.0),
    ("stmt1.pdf", 1, "01/06", 80.0, 98.0, 235.0, 243.0),
    ("stmt1.pdf", 1, "8832REF", 120.0, 165.0, 235.0, 243.0),
    ("stmt1.pdf", 1, "REFUND", 200.0, 238.0, 235.0, 243.0),
    ("stmt1.pdf", 1, "ITEM", 242.0, 266.0, 235.0, 243.0),
    ("stmt1.pdf", 1, "15.00", 480.0, 501.0, 235.0, 243.0),
    # Row C: payment row -> dropped (P5)
    ("stmt1.pdf", 1, "01/07", 40.0, 58.0, 250.0, 258.0),
    ("stmt1.pdf", 1, "01/07", 80.0, 98.0, 250.0, 258.0),
    ("stmt1.pdf", 1, "9999REF", 120.0, 165.0, 250.0, 258.0),
    ("stmt1.pdf", 1, "PAYMENT", 200.0, 245.0, 250.0, 258.0),
    ("stmt1.pdf", 1, "THANK", 250.0, 284.0, 250.0, 258.0),
    ("stmt1.pdf", 1, "YOU", 288.0, 308.0, 250.0, 258.0),
    ("stmt1.pdf", 1, "125.00", 545.0, 571.0, 250.0, 258.0),
    # Row D: amount-shaped token INSIDE the description (rightmost wins)
    ("stmt1.pdf", 1, "01/09", 40.0, 58.0, 265.0, 273.0),
    ("stmt1.pdf", 1, "01/09", 80.0, 98.0, 265.0, 273.0),
    ("stmt1.pdf", 1, "5511REF", 120.0, 165.0, 265.0, 273.0),
    ("stmt1.pdf", 1, "ACME", 200.0, 228.0, 265.0, 273.0),
    ("stmt1.pdf", 1, "12.50", 232.0, 258.0, 265.0, 273.0),
    ("stmt1.pdf", 1, "FEE", 262.0, 280.0, 265.0, 273.0),
    ("stmt1.pdf", 1, "27.80", 548.0, 570.0, 265.0, 273.0),
    # Row E: sub-4-word footer -> dropped (P2)
    ("stmt1.pdf", 1, "Page", 40.0, 64.0, 280.0, 288.0),
    ("stmt1.pdf", 1, "1", 68.0, 74.0, 280.0, 288.0),
    # Row F: subtotal fails MM/DD check -> dropped (P3)
    ("stmt1.pdf", 1, "Subtotal", 40.0, 85.0, 295.0, 303.0),
    ("stmt1.pdf", 1, "for", 90.0, 105.0, 295.0, 303.0),
    ("stmt1.pdf", 1, "period", 110.0, 142.0, 295.0, 303.0),
    ("stmt1.pdf", 1, "1,234.56", 540.0, 571.0, 295.0, 303.0),
    # Row G: description too short (len<3) -> dropped (P6)
    ("stmt1.pdf", 1, "01/11", 40.0, 58.0, 310.0, 318.0),
    ("stmt1.pdf", 1, "01/12", 80.0, 98.0, 310.0, 318.0),
    ("stmt1.pdf", 1, "7777REF", 120.0, 165.0, 310.0, 318.0),
    ("stmt1.pdf", 1, "AB", 200.0, 215.0, 310.0, 318.0),
    ("stmt1.pdf", 1, "10.00", 548.0, 569.0, 310.0, 318.0),
    # Row H: thousands-separator amount
    ("stmt1.pdf", 1, "01/15", 40.0, 58.0, 325.0, 333.0),
    ("stmt1.pdf", 1, "01/16", 80.0, 98.0, 325.0, 333.0),
    ("stmt1.pdf", 1, "3344REF", 120.0, 165.0, 325.0, 333.0),
    ("stmt1.pdf", 1, "BIGVENDOR", 200.0, 260.0, 325.0, 333.0),
    ("stmt1.pdf", 1, "PURCHASE", 264.0, 318.0, 325.0, 333.0),
    ("stmt1.pdf", 1, "1,234.56", 538.0, 571.5, 325.0, 333.0),
    # Row I: upward jitter within the 3pt anchor tolerance (one row)
    ("stmt1.pdf", 1, "01/20", 40.0, 58.0, 340.0, 348.0),
    ("stmt1.pdf", 1, "01/21", 80.0, 98.0, 340.0, 348.0),
    ("stmt1.pdf", 1, "4455REF", 120.0, 165.0, 340.0, 348.0),
    ("stmt1.pdf", 1, "STORE", 200.0, 232.0, 340.9, 348.9),
    ("stmt1.pdf", 1, "OUTLET", 236.0, 274.0, 341.4, 349.4),
    ("stmt1.pdf", 1, "22.22", 547.0, 568.0, 342.0, 350.0),
    # Row J: >=3pt gap from row I anchor AND from its last word -> new row
    ("stmt1.pdf", 1, "01/22", 40.0, 58.0, 345.1, 353.1),
    ("stmt1.pdf", 1, "01/23", 80.0, 98.0, 345.1, 353.1),
    ("stmt1.pdf", 1, "6611REF", 120.0, 165.0, 345.1, 353.1),
    ("stmt1.pdf", 1, "CAFE", 200.0, 226.0, 345.1, 353.1),
    ("stmt1.pdf", 1, "LUNCH", 230.0, 262.0, 345.1, 353.1),
    ("stmt1.pdf", 1, "8.40", 482.0, 500.0, 345.1, 353.1),
    # ---- stmt1.pdf page 2: disclosures page, no headers -> no output ----
    ("stmt1.pdf", 2, "Disclosures", 40.0, 110.0, 100.0, 110.0),
    ("stmt1.pdf", 2, "01/31", 40.0, 58.0, 220.0, 228.0),
    ("stmt1.pdf", 2, "01/31", 80.0, 98.0, 220.0, 228.0),
    ("stmt1.pdf", 2, "XREF", 120.0, 150.0, 220.0, 228.0),
    ("stmt1.pdf", 2, "GHOST", 200.0, 235.0, 220.0, 228.0),
    ("stmt1.pdf", 2, "99.99", 548.0, 570.0, 220.0, 228.0),
    # ---- stmt2.pdf page 1: different column geometry -------------------
    ("stmt2.pdf", 1, "Credits", 360.0, 400.0, 150.0, 160.0),
    ("stmt2.pdf", 1, "Charges", 462.0, 500.0, 150.4, 160.4),
    ("stmt2.pdf", 1, "Trans", 40.0, 60.0, 170.0, 178.0),
    ("stmt2.pdf", 1, "Post", 80.0, 95.0, 170.5, 178.5),
    ("stmt2.pdf", 1, "Reference", 120.0, 160.0, 170.9, 178.9),
    ("stmt2.pdf", 1, "02/01", 40.0, 58.0, 190.0, 198.0),
    ("stmt2.pdf", 1, "02/02", 80.0, 98.0, 190.0, 198.0),
    ("stmt2.pdf", 1, "1111REF", 120.0, 165.0, 190.0, 198.0),
    ("stmt2.pdf", 1, "VENDOR2", 200.0, 250.0, 190.0, 198.0),
    ("stmt2.pdf", 1, "SERVICES", 254.0, 308.0, 190.0, 198.0),
    ("stmt2.pdf", 1, "55.00", 477.0, 498.0, 190.0, 198.0),
    ("stmt2.pdf", 1, "02/03", 40.0, 58.0, 205.0, 213.0),
    ("stmt2.pdf", 1, "02/03", 80.0, 98.0, 205.0, 213.0),
    ("stmt2.pdf", 1, "2222REF", 120.0, 165.0, 205.0, 213.0),
    ("stmt2.pdf", 1, "VENDOR3", 200.0, 250.0, 205.0, 213.0),
    ("stmt2.pdf", 1, "PARTS", 254.0, 288.0, 205.0, 213.0),
    ("stmt2.pdf", 1, "44.10", 378.0, 399.0, 205.0, 213.0),
]

# Chart-of-accounts cell grid (reference pdf_parser.py:423-512):
# (path, page, table_idx, row_idx, cells)
COA_COLUMNS = ("path", "page", "table_idx", "row_idx", "cells")
COA_DDL = "path string, page int, table_idx int, row_idx int, cells array<string>"

COA_ROWS: list[tuple] = [
    # funder table: header row + valid/invalid codes + duplicate (last wins)
    ("coa.pdf", 1, 0, 0, ["FUNDER CODE", "FUNDER NAME"]),
    ("coa.pdf", 1, 0, 1, ["1001", "General Fund"]),
    ("coa.pdf", 1, 0, 2, ["1002", "Capital Fund"]),
    ("coa.pdf", 1, 0, 3, ["1001", "General Fund Revised"]),  # dup -> last wins
    ("coa.pdf", 1, 0, 4, ["12", "Too Short"]),               # fails ^\d{4}$
    ("coa.pdf", 1, 0, 5, ["", "Empty Code"]),                # empty -> skip
    ("coa.pdf", 1, 0, 6, ["1003", None]),                    # empty name -> skip
    # GL table classified via 'EXP' + 'CODE' keywords
    ("coa.pdf", 1, 1, 0, ["EXP/GL CODE", "DESCRIPTION"]),
    ("coa.pdf", 1, 1, 1, ["50010", "Salaries"]),
    ("coa.pdf", 1, 1, 2, ["50020", "Benefits"]),
    ("coa.pdf", 1, 1, 3, ["5003", "Wrong Width"]),           # fails ^\d{5}$
    # location table
    ("coa.pdf", 2, 0, 0, ["LOC CODE", "SITE"]),
    ("coa.pdf", 2, 0, 1, ["01", "Main Office"]),
    ("coa.pdf", 2, 0, 2, ["02", "Annex"]),
    ("coa.pdf", 2, 0, 3, ["003", "Wrong Width"]),            # fails ^\d{2}$
    # program table (flexible numeric length)
    ("coa.pdf", 2, 1, 0, ["PROG CODE", "PROGRAM"]),
    ("coa.pdf", 2, 1, 1, ["7", "Outreach"]),
    ("coa.pdf", 2, 1, 2, ["712", "Education"]),
    ("coa.pdf", 2, 1, 3, ["71A", "Not Numeric"]),            # fails ^\d+$
    # dept table; row containing CODE in a data cell is skipped
    ("coa.pdf", 3, 0, 0, ["DEPT CODE", "DEPARTMENT"]),
    ("coa.pdf", 3, 0, 1, ["300", "Finance"]),
    ("coa.pdf", 3, 0, 2, ["CODE 301", "Has Code Word"]),     # contains CODE
    ("coa.pdf", 3, 0, 3, ["302", "Operations"]),
    # unclassified table: no keyword in first 3 rows -> entire table skipped
    ("coa.pdf", 3, 1, 0, ["MISC", "STUFF"]),
    ("coa.pdf", 3, 1, 1, ["999", "Ignored"]),
]

# Vendor-mapping dimension (reference database.py:61-79): includes an
# exact match, fuzzy-only superstrings, competing fuzzy candidates
# (tie-break test), and an unmatched vendor.
VENDOR_COLUMNS = (
    "vendor", "gl_account", "location", "program", "funder", "department",
    "created_at",
)
VENDOR_DDL = (
    "vendor string, gl_account string, location string, program string, "
    "funder string, department string, created_at string"
)

VENDOR_ROWS: list[tuple] = [
    ("AMAZON MKTPL", "50010", "01", "712", "1001", "300", "2025-01-01 00:00:00"),
    ("MEGA STORE OUTLET INC", "50020", "02", "7", "1002", "302", "2025-01-02 00:00:00"),
    ("BEST CAFE LUNCH BAR", "50010", "01", "7", "1001", "300", "2025-01-03 00:00:00"),
    ("A CAFE LUNCH", "50020", "02", "712", "1002", "302", "2025-01-04 00:00:00"),
    ("UNRELATED VENDOR", "50010", "01", "7", "1001", "300", "2025-01-05 00:00:00"),
]


def _sql_lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, list):
        return "[" + ", ".join(_sql_lit(x) for x in v) + "]"
    return repr(v)


def values_clause(rows: list[tuple]) -> str:
    """Render fixture rows as a DuckDB VALUES list."""
    return ",\n    ".join(
        "(" + ", ".join(_sql_lit(v) for v in row) + ")" for row in rows
    )


def words_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(WORDS_ROWS, WORDS_DDL)


def coa_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(COA_ROWS, COA_DDL)


def vendor_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(VENDOR_ROWS, VENDOR_DDL)


def words_cte() -> str:
    cols = ", ".join(WORDS_COLUMNS)
    return f"words({cols}) AS (VALUES\n    {values_clause(WORDS_ROWS)}\n)"


def coa_cte() -> str:
    cols = ", ".join(COA_COLUMNS)
    return f"coa_cells({cols}) AS (VALUES\n    {values_clause(COA_ROWS)}\n)"


def vendor_cte() -> str:
    cols = ", ".join(VENDOR_COLUMNS)
    return f"vendor_dim({cols}) AS (VALUES\n    {values_clause(VENDOR_ROWS)}\n)"


# ---- real PDF byte fixtures (rendered by sources/pdf_codec) ---------

def _right(text: str, x1: float, size: float = 10.0) -> float:
    """x0 that right-aligns Courier ``text`` at ``x1`` — amounts in the
    statement layout right-align under their column header."""
    return x1 - 0.6 * size * len(text)


def statement_pdf_pages() -> dict[str, list[list[tuple]]]:
    """Two statement PDFs as draw-command pages (text, x, y_top, size):
    the Wells-Fargo shape (reference pdf_parser.py:72-84) with real
    geometry — right-aligned amounts under the Credits/Charges pair, an
    Account-Summary decoy on split lines, a payment row, a disclosures
    page that fails the P1 predicate, and a second file with different
    column x-positions. Render with ``pdf_codec.write_pdf``."""
    s = 10.0
    a_p1 = [
        # Account-Summary decoy: pair on DIFFERENT lines
        ("Credits", 50, 100, s), ("Charges", 50, 120, s),
        ("Transaction Details", 50, 180, s),
        # column headers, same line; Courier x1: 460+42=502, 530+42=572
        ("Credits", 460, 210, s), ("Charges", 530, 210, s),
        ("Trans", 40, 225, s), ("Post", 80, 225, s),
        ("Reference", 120, 225, s), ("Number", 180, 225, s),
        ("01/03", 40, 240, s), ("01/03", 80, 240, s),
        ("2466ABCD", 120, 240, s), ("AMAZON MKTPL", 200, 240, s),
        ("39.12", _right("39.12", 572.0), 240, s),
        ("01/05", 40, 255, s), ("01/06", 80, 255, s),
        ("8832REF", 120, 255, s), ("REFUND ITEM", 200, 255, s),
        ("15.00", _right("15.00", 502.0), 255, s),
        ("01/07", 40, 270, s), ("01/07", 80, 270, s),
        ("9999REF", 120, 270, s), ("PAYMENT THANK YOU", 200, 270, s),
        ("125.00", _right("125.00", 572.0), 270, s),
        ("01/15", 40, 285, s), ("01/16", 80, 285, s),
        ("3344REF", 120, 285, s), ("BIGVENDOR PURCHASE", 200, 285, s),
        ("1,234.56", _right("1,234.56", 572.0), 285, s),
    ]
    a_p2 = [("Disclosures and terms", 50, 100, 12.0)]
    b_p1 = [
        ("Transaction Details", 50, 120, s),
        # different geometry: x1 = 358+42=400, 458+42=500
        ("Credits", 358, 150, s), ("Charges", 458, 150, s),
        ("Trans", 40, 170, s), ("Post", 80, 170, s),
        ("Reference", 120, 170, s),
        ("02/01", 40, 190, s), ("02/02", 80, 190, s),
        ("1111REF", 120, 190, s), ("VENDOR2 SERVICES", 200, 190, s),
        ("55.00", _right("55.00", 500.0), 190, s),
        ("02/02", 40, 205, s), ("02/03", 80, 205, s),
        ("2222REF", 120, 205, s), ("VENDOR3 PARTS", 200, 205, s),
        ("44.10", _right("44.10", 400.0), 205, s),
    ]
    return {"stmt_a.pdf": [a_p1, a_p2], "stmt_b.pdf": [b_p1]}


# (date, description, amount) truth for the PDF fixtures above
STATEMENT_PDF_EXPECTED = {
    ("stmt_a.pdf", "01/03", "AMAZON MKTPL"): 39.12,
    ("stmt_a.pdf", "01/06", "REFUND ITEM"): -15.00,
    ("stmt_a.pdf", "01/16", "BIGVENDOR PURCHASE"): 1234.56,
    ("stmt_b.pdf", "02/02", "VENDOR2 SERVICES"): 55.00,
    ("stmt_b.pdf", "02/03", "VENDOR3 PARTS"): -44.10,
}


def write_statement_pdfs(dirpath, *, compress: bool = True) -> None:
    """Render the fixture statements as real .pdf files under
    ``dirpath`` (any os.PathLike)."""
    import pathlib

    from ..sources.pdf_codec import write_pdf

    d = pathlib.Path(dirpath)
    d.mkdir(parents=True, exist_ok=True)
    for name, pages in statement_pdf_pages().items():
        (d / name).write_bytes(write_pdf(pages, compress=compress))


def coa_pdf_pages() -> list[list[tuple]]:
    """The COA_ROWS cell grid as rendered PDF pages: two-column code
    tables at x=50/x=150, 15pt row pitch, 50pt inter-table gaps (the
    words→grid operator splits tables at >=18pt). Cell content and
    expected extract_codes output match the literal COA_ROWS fixture;
    empty cells are simply unrendered words."""
    s = 10.0

    def table(y0, rows):
        cmds = []
        for i, (c0, c1) in enumerate(rows):
            y = y0 + 15 * i
            if c0:
                cmds.append((c0, 50, y, s))
            if c1:
                cmds.append((c1, 150, y, s))
        return cmds

    p1 = table(100, [
        ("FUNDER CODE", "FUNDER NAME"),
        ("1001", "General Fund"),
        ("1002", "Capital Fund"),
        ("1001", "General Fund Revised"),
        ("12", "Too Short"),
        (None, "Empty Code"),
        ("1003", None),
    ]) + table(295, [
        ("EXP/GL CODE", "DESCRIPTION"),
        ("50010", "Salaries"),
        ("50020", "Benefits"),
        ("5003", "Wrong Width"),
    ])
    p2 = table(100, [
        ("LOC CODE", "SITE"),
        ("01", "Main Office"),
        ("02", "Annex"),
        ("003", "Wrong Width"),
    ]) + table(210, [
        ("PROG CODE", "PROGRAM"),
        ("7", "Outreach"),
        ("712", "Education"),
        ("71A", "Not Numeric"),
    ])
    p3 = table(100, [
        ("DEPT CODE", "DEPARTMENT"),
        ("300", "Finance"),
        ("CODE 301", "Has Code Word"),
        ("302", "Operations"),
    ]) + table(210, [
        ("MISC", "STUFF"),
        ("999", "Ignored"),
    ])
    return [p1, p2, p3]


def write_coa_pdf(dirpath, *, name: str = "coa.pdf") -> None:
    import pathlib

    from ..sources.pdf_codec import write_pdf

    d = pathlib.Path(dirpath)
    d.mkdir(parents=True, exist_ok=True)
    (d / name).write_bytes(write_pdf(coa_pdf_pages()))
