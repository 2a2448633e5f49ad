"""Excel workbook sink (K1, reference excel_builder.py:17-181).

Excel is not a distributed format: the correctness surface is the
DataFrame content (P12 projection below, oracle-checked in
queries/reference_pipeline.py); the workbook itself is a driver-side
presentation tail. The flow mirrors the reference byte-for-byte where
the library allows:

- ``excel_rows``: P12 — the 10 fixed output columns, Description
  forced present, Receipt_Received forced False
  (excel_builder.py:39-52);
- ``dropdown_options``: P17/J5 — 'code - name' options per code type
  for the hidden Dropdown_Lists sheet (excel_builder.py:104-135);
- ``column_widths``: A5 — per-column max display width capped at 50
  (excel_builder.py:167-178), computed distributed-side so the
  driver never scans values;
- ``write_workbook``: formatted workbook (currency format, header
  fill, freeze panes, hidden dropdown sheet + list validations) via
  openpyxl when installed, else via the pure-stdlib OOXML writer in
  :mod:`accounting_etl_spark.sinks.xlsx_mini` — a real .xlsx either
  way; rows are capped before collect (SURVEY §7 watch list).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EXCEL_COLUMNS = [
    "Date", "Vendor", "Description", "G/L Account", "Location",
    "Program", "Funder", "Dept", "Amount", "Receipt_Received",
]

_SRC = {
    "Date": "stmt_date_str",
    "Vendor": "vendor",
    "Description": "description",
    "G/L Account": "gl_account",
    "Location": "location",
    "Program": "program",
    "Funder": "funder",
    "Dept": "department",
    "Amount": "amount",
}


def excel_rows(txns: DataFrame) -> DataFrame:
    """P12: project enriched transactions to the 10 output columns."""
    cols = []
    for out in EXCEL_COLUMNS:
        if out == "Receipt_Received":
            cols.append(F.lit(False).alias(out))
        elif out in ("G/L Account", "Location", "Program", "Funder", "Dept"):
            src = _SRC[out]
            have = src in txns.columns
            cols.append(
                (F.col(src) if have else F.lit(None).cast("string")).alias(out)
            )
        else:
            cols.append(F.col(_SRC[out]).alias(out))
    return txns.select(*cols)


def dropdown_options(codes: DataFrame) -> DataFrame:
    """P17: '<code> - <name>' options per code type, code-sorted (O2)."""
    return (
        codes.select(
            "code_type",
            F.concat_ws(" - ", F.col("code"), F.col("name")).alias("option"),
        )
        .orderBy("code_type", "option")
    )


def column_widths(rows: DataFrame, cap: int = 50) -> dict[str, int]:
    """A5: max(len(header), max len(value)) per column, capped.

    Computed as ONE distributed aggregation — the driver receives one
    row, never the data.
    """
    aggs = [
        F.greatest(
            F.lit(len(c)),
            F.coalesce(F.max(F.length(F.col(c).cast("string"))), F.lit(0)),
        ).alias(c)
        for c in rows.columns
    ]
    widths = rows.agg(*aggs).collect()[0].asDict()
    return {c: min(int(w) + 2, cap) for c, w in widths.items()}


def write_workbook(
    rows: DataFrame,
    codes: DataFrame | None,
    out_path: str,
    *,
    max_rows: int = 100_000,
) -> str:
    """K1: collect (capped) and write the formatted workbook.

    The distributed work (projection, widths, dropdown options) happens
    before collect; the presentation tail writes with openpyxl when
    installed, else with the built-in pure-stdlib writer
    (:mod:`accounting_etl_spark.sinks.xlsx_mini`) — a real .xlsx is
    produced either way.
    """
    widths = column_widths(rows)
    pdf = rows.limit(max_rows).toPandas()
    opts = dropdown_options(codes).toPandas() if codes is not None else None
    try:
        import openpyxl  # noqa: F401
    except ImportError:
        return _write_workbook_mini(pdf, widths, opts, out_path)
    return _write_workbook_openpyxl(pdf, widths, opts, out_path)


_DROPDOWN_TARGETS = {
    "gl": "G/L Account", "location": "Location",
    "program": "Program", "funder": "Funder", "dept": "Dept",
}


def _py(v):
    """numpy scalar -> plain python for the XML writer."""
    return v.item() if hasattr(v, "item") else v


def _write_workbook_mini(pdf, widths, opts, out_path: str) -> str:
    from .xlsx_mini import Sheet, Validation, column_letter, write_xlsx

    cols = list(pdf.columns)
    data = [cols] + [
        [_py(v) for v in rec] for rec in pdf.itertuples(index=False)
    ]
    main = Sheet(
        name="Transactions",
        rows=data,
        col_widths={
            i: widths.get(c, 12) for i, c in enumerate(cols, start=1)
        },
        currency_cols=frozenset(
            {cols.index("Amount") + 1} if "Amount" in cols else ()
        ),
        center_cols=frozenset(
            {cols.index("Date") + 1} if "Date" in cols else ()
        ),
        freeze_header=True,
    )
    sheets = [main]
    if opts is not None and len(opts):
        dd_rows: list[list] = []
        col_map: dict[str, tuple[int, int]] = {}
        groups = [(t, g) for t, g in opts.groupby("code_type")]
        for j, (ctype, group) in enumerate(groups, start=1):
            col_map[ctype] = (j, len(group))
            for i, opt in enumerate(group["option"]):
                while len(dd_rows) < i + 2:
                    dd_rows.append([None] * len(groups))
                dd_rows[i + 1][j - 1] = opt
            if not dd_rows:
                dd_rows.append([None] * len(groups))
            dd_rows[0][j - 1] = ctype
        dd = Sheet(
            name="Dropdown_Lists", rows=dd_rows,
            header_style=False, hidden=True,
        )
        for ctype, (j, count) in col_map.items():
            target = _DROPDOWN_TARGETS.get(ctype)
            if target is None or target not in cols:
                continue
            letter = column_letter(j)
            out_letter = column_letter(cols.index(target) + 1)
            main.validations.append(Validation(
                sqref=f"{out_letter}2:{out_letter}{len(data)}",
                formula=(
                    f"Dropdown_Lists!${letter}$2:${letter}${count + 1}"
                ),
                prompt=f"Please select a {target} from the dropdown",
                error=f"Invalid {target}",
            ))
        sheets.append(dd)
    return write_xlsx(out_path, sheets)


def _write_workbook_openpyxl(pdf, widths, opts, out_path: str) -> str:
    import openpyxl
    from openpyxl.styles import Alignment, Border, Font, PatternFill, Side
    from openpyxl.utils import get_column_letter
    from openpyxl.worksheet.datavalidation import DataValidation

    wb = openpyxl.Workbook()
    ws = wb.active
    ws.title = "Transactions"
    header_fill = PatternFill("solid", fgColor="4472C4")
    header_font = Font(bold=True, color="FFFFFF")
    border = Border(bottom=Side(style="thin"))
    ws.append(list(pdf.columns))
    for cell in ws[1]:
        cell.fill = header_fill
        cell.font = header_font
        cell.border = border
    for rec in pdf.itertuples(index=False):
        ws.append(list(rec))
    amount_idx = list(pdf.columns).index("Amount") + 1 if "Amount" in pdf.columns else None
    date_idx = list(pdf.columns).index("Date") + 1 if "Date" in pdf.columns else None
    for r in range(2, ws.max_row + 1):
        if amount_idx:
            ws.cell(row=r, column=amount_idx).number_format = "$#,##0.00"
        if date_idx:
            ws.cell(row=r, column=date_idx).alignment = Alignment(horizontal="center")
    for i, col in enumerate(pdf.columns, start=1):
        ws.column_dimensions[get_column_letter(i)].width = widths.get(col, 12)
    ws.freeze_panes = "A2"

    if opts is not None and len(opts):
        dd = wb.create_sheet("Dropdown_Lists")
        col_map = {}
        for j, (ctype, group) in enumerate(opts.groupby("code_type"), start=1):
            dd.cell(row=1, column=j, value=ctype)
            for i, opt in enumerate(group["option"], start=2):
                dd.cell(row=i, column=j, value=opt)
            col_map[ctype] = (j, len(group))
        dd.sheet_state = "hidden"
        for ctype, (j, count) in col_map.items():
            target = _DROPDOWN_TARGETS
            if ctype not in target or target[ctype] not in pdf.columns:
                continue
            letter = get_column_letter(j)
            dv = DataValidation(
                type="list",
                formula1=f"Dropdown_Lists!${letter}$2:${letter}${count + 1}",
                allow_blank=True,
            )
            ws.add_data_validation(dv)
            out_letter = get_column_letter(list(pdf.columns).index(target[ctype]) + 1)
            dv.add(f"{out_letter}2:{out_letter}{ws.max_row}")

    wb.save(out_path)
    return out_path
