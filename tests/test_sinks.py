"""Excel sink tests (K1/P12/P17/A5): distributed pieces verified, and
the workbook write produces a REAL .xlsx through the pure-stdlib
writer (sinks/xlsx_mini.py) when openpyxl is absent — parsed back
from the ZIP'd SpreadsheetML for every feature the reference uses
(excel_builder.py:56-181): values, header styling, currency format,
widths, frozen header, hidden dropdown sheet, list validations.
"""

from __future__ import annotations

import pytest


def _txns(spark):
    from accounting_etl_spark.plans import fixtures as FX
    from accounting_etl_spark.plans.statement import extract_transactions

    return extract_transactions(FX.words_df(spark))


def test_excel_projection_shape(spark):
    from accounting_etl_spark.sinks.excel import EXCEL_COLUMNS, excel_rows

    rows = excel_rows(_txns(spark))
    assert rows.columns == EXCEL_COLUMNS
    pdf = rows.toPandas()
    assert (pdf["Receipt_Received"] == False).all()  # noqa: E712
    assert pdf["Description"].notna().all()
    assert pdf["G/L Account"].isna().all()  # unenriched -> null codes


def test_column_widths_capped(spark):
    from accounting_etl_spark.sinks.excel import column_widths, excel_rows

    widths = column_widths(excel_rows(_txns(spark)))
    assert widths["Receipt_Received"] == len("Receipt_Received") + 2
    assert all(1 <= w <= 50 for w in widths.values())
    # BIGVENDOR PURCHASE (18 chars) + 2 padding
    assert widths["Vendor"] == 20


def test_dropdown_options_format(spark):
    from accounting_etl_spark.plans import fixtures as FX
    from accounting_etl_spark.plans.coa import extract_codes
    from accounting_etl_spark.sinks.excel import dropdown_options

    opts = dropdown_options(extract_codes(FX.coa_df(spark))).collect()
    by_type = {}
    for r in opts:
        by_type.setdefault(r.code_type, []).append(r.option)
    assert by_type["gl"] == ["50010 - Salaries", "50020 - Benefits"]
    assert by_type["funder"][0] == "1001 - General Fund Revised"


def test_write_workbook_real_xlsx(spark, tmp_path):
    from accounting_etl_spark.plans import fixtures as FX
    from accounting_etl_spark.plans.coa import extract_codes
    from accounting_etl_spark.sinks.excel import excel_rows, write_workbook
    from accounting_etl_spark.sinks.xlsx_mini import read_xlsx

    rows = excel_rows(_txns(spark))
    codes = extract_codes(FX.coa_df(spark))
    path = write_workbook(rows, codes, str(tmp_path / "o.xlsx"))
    wb = read_xlsx(path)

    assert wb["order"][0] == "Transactions"
    assert "Dropdown_Lists" in wb["hidden"]
    main = wb["sheets"]["Transactions"]
    header = [v for v, _ in main["rows"][0]]
    assert header[:3] == ["Date", "Vendor", "Description"]
    # row content round-trips: the AMAZON charge with its float amount
    body = {
        (r[0][0], r[2][0]): r[8][0] for r in main["rows"][1:]
    }
    assert body[("01/03", "AMAZON MKTPL")] == pytest.approx(39.12)
    # Receipt_Received round-trips as a real boolean
    assert all(r[9][0] is False for r in main["rows"][1:])
    assert main["frozen"] is True
    # width cap + padding from the distributed aggregate (A5)
    assert main["widths"][2] == 20  # Vendor: len('BIGVENDOR PURCHASE')+2
    # dropdowns reference the hidden sheet ranges
    forms = {v.formula for v in main["validations"]}
    assert any(f.startswith("Dropdown_Lists!$") for f in forms)
    targets = {v.sqref[0] for v in main["validations"]}
    assert "D" in targets  # G/L Account column
    dd = wb["sheets"]["Dropdown_Lists"]
    flat = [v for row in dd["rows"] for v, _ in row if v]
    assert "50010 - Salaries" in flat


def test_mini_xlsx_writer_direct(tmp_path):
    """Writer/reader round-trip without Spark: types, styles, refs."""
    from accounting_etl_spark.sinks.xlsx_mini import (
        STYLE_CURRENCY,
        STYLE_HEADER,
        Sheet,
        Validation,
        column_letter,
        read_xlsx,
        write_xlsx,
    )

    assert [column_letter(i) for i in (1, 26, 27, 52, 703)] == [
        "A", "Z", "AA", "AZ", "AAA",
    ]
    sheet = Sheet(
        name="S", rows=[["h1", "h2"], ["a&<b>", 1.5], [None, True]],
        currency_cols=frozenset({2}), freeze_header=True,
        col_widths={1: 12.0},
        validations=[Validation(sqref="B2:B3", formula="S!$A$1:$A$2")],
    )
    wb = read_xlsx(write_xlsx(str(tmp_path / "t.xlsx"), [sheet]))
    rows = wb["sheets"]["S"]["rows"]
    assert rows[0][0] == ("h1", STYLE_HEADER)
    assert rows[1][0][0] == "a&<b>"          # XML escaping round-trips
    assert rows[1][1] == (1.5, STYLE_CURRENCY)
    assert rows[2][1][0] is True
    assert wb["sheets"]["S"]["widths"] == {1: 12.0}
    assert wb["sheets"]["S"]["validations"][0].formula == "S!$A$1:$A$2"
