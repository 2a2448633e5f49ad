"""Excel sink tests (K1/P12/P17/A5): distributed pieces verified;
the openpyxl write is gated on the missing library.
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


def test_write_workbook_gated_without_openpyxl(spark, tmp_path):
    from accounting_etl_spark.sinks.excel import excel_rows, write_workbook

    try:
        import openpyxl  # noqa: F401

        pytest.skip("openpyxl available — gate test not applicable")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="openpyxl"):
        write_workbook(excel_rows(_txns(spark)), None, str(tmp_path / "o.xlsx"))
