"""Pure-stdlib XLSX writer/reader (OOXML SpreadsheetML).

Closes the "openpyxl is absent so no real workbook was ever written"
gap (reference excel_builder.py:56-181): an .xlsx file is a ZIP of
XML parts, all public ECMA-376 spec — this module emits a real
workbook with the features the reference uses (header fill/bold,
currency number format, per-column widths, frozen header row, a
hidden Dropdown_Lists sheet, list data-validation dropdowns wired to
it) using only ``zipfile`` + string XML, and parses it back for
verification. Inline strings are used instead of a shared-strings
table: simpler, valid, and the writer streams rows without building a
global dictionary.

Only the driver-side presentation tail lives here — row content,
dropdown option lists, and column widths are computed distributed in
:mod:`accounting_etl_spark.sinks.excel` before this module sees them.
"""

from __future__ import annotations

import re
import zipfile
from dataclasses import dataclass, field
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

_NS = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_NS_REL = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
_NS_PKG_REL = "http://schemas.openxmlformats.org/package/2006/relationships"
_NS_CT = "http://schemas.openxmlformats.org/package/2006/content-types"

# cellXfs indices baked into _STYLES_XML below
STYLE_DEFAULT = 0
STYLE_HEADER = 1    # bold white on solid fill, centered, thin border
STYLE_CURRENCY = 2  # $#,##0.00, right-aligned
STYLE_CENTER = 3

_STYLES_XML = f"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<styleSheet xmlns="{_NS}">
<numFmts count="1"><numFmt numFmtId="164" formatCode="&quot;$&quot;#,##0.00"/></numFmts>
<fonts count="2"><font><sz val="11"/><name val="Calibri"/></font>
<font><b/><color rgb="FFFFFFFF"/><sz val="11"/><name val="Arial"/></font></fonts>
<fills count="3"><fill><patternFill patternType="none"/></fill>
<fill><patternFill patternType="gray125"/></fill>
<fill><patternFill patternType="solid"><fgColor rgb="FF4472C4"/><bgColor indexed="64"/></patternFill></fill></fills>
<borders count="2"><border><left/><right/><top/><bottom/><diagonal/></border>
<border><left style="thin"/><right style="thin"/><top style="thin"/><bottom style="thin"/><diagonal/></border></borders>
<cellStyleXfs count="1"><xf numFmtId="0" fontId="0" fillId="0" borderId="0"/></cellStyleXfs>
<cellXfs count="4">
<xf numFmtId="0" fontId="0" fillId="0" borderId="0" xfId="0"/>
<xf numFmtId="0" fontId="1" fillId="2" borderId="1" xfId="0" applyFont="1" applyFill="1" applyBorder="1" applyAlignment="1"><alignment horizontal="center" vertical="center"/></xf>
<xf numFmtId="164" fontId="0" fillId="0" borderId="0" xfId="0" applyNumberFormat="1" applyAlignment="1"><alignment horizontal="right"/></xf>
<xf numFmtId="0" fontId="0" fillId="0" borderId="0" xfId="0" applyAlignment="1"><alignment horizontal="center"/></xf>
</cellXfs></styleSheet>"""


def column_letter(idx: int) -> str:
    """1-based column index -> A1 letter(s)."""
    out = ""
    while idx > 0:
        idx, rem = divmod(idx - 1, 26)
        out = chr(65 + rem) + out
    return out


@dataclass
class Validation:
    """A list-type data validation: dropdown over ``sqref`` cells whose
    options live at ``formula`` (e.g. Dropdown_Lists!$A$2:$A$9)."""

    sqref: str
    formula: str
    prompt: str = ""
    error: str = ""


@dataclass
class Sheet:
    name: str
    rows: list[list] = field(default_factory=list)  # first row = header
    header_style: bool = True
    col_widths: dict[int, float] = field(default_factory=dict)  # 1-based
    currency_cols: frozenset[int] = frozenset()  # 1-based, rows >= 2
    center_cols: frozenset[int] = frozenset()
    freeze_header: bool = False
    hidden: bool = False
    validations: list[Validation] = field(default_factory=list)


def _cell_xml(ref: str, value, style: int) -> str:
    s = f' s="{style}"' if style else ""
    if value is None:
        return f'<c r="{ref}"{s}/>'
    if isinstance(value, bool):
        return f'<c r="{ref}"{s} t="b"><v>{int(value)}</v></c>'
    if isinstance(value, (int, float)):
        return f'<c r="{ref}"{s}><v>{value!r}</v></c>'
    txt = escape(str(value))
    return (
        f'<c r="{ref}"{s} t="inlineStr"><is>'
        f'<t xml:space="preserve">{txt}</t></is></c>'
    )


def _sheet_xml(sh: Sheet) -> str:
    parts = [
        f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<worksheet xmlns="{_NS}">'
    ]
    if sh.freeze_header:
        parts.append(
            '<sheetViews><sheetView workbookViewId="0">'
            '<pane ySplit="1" topLeftCell="A2" activePane="bottomLeft" '
            'state="frozen"/></sheetView></sheetViews>'
        )
    if sh.col_widths:
        cols = "".join(
            f'<col min="{i}" max="{i}" width="{w}" customWidth="1"/>'
            for i, w in sorted(sh.col_widths.items())
        )
        parts.append(f"<cols>{cols}</cols>")
    parts.append("<sheetData>")
    for r, row in enumerate(sh.rows, start=1):
        cells = []
        for c, value in enumerate(row, start=1):
            if r == 1 and sh.header_style:
                style = STYLE_HEADER
            elif c in sh.currency_cols:
                style = STYLE_CURRENCY
            elif c in sh.center_cols:
                style = STYLE_CENTER
            else:
                style = STYLE_DEFAULT
            cells.append(_cell_xml(f"{column_letter(c)}{r}", value, style))
        parts.append(f'<row r="{r}">{"".join(cells)}</row>')
    parts.append("</sheetData>")
    if sh.validations:
        vs = "".join(
            f'<dataValidation type="list" allowBlank="1" '
            f'showInputMessage="1" showErrorMessage="1" '
            f'prompt="{escape(v.prompt)}" error="{escape(v.error)}" '
            f'sqref="{v.sqref}"><formula1>{escape(v.formula)}</formula1>'
            f"</dataValidation>"
            for v in sh.validations
        )
        parts.append(
            f'<dataValidations count="{len(sh.validations)}">{vs}'
            f"</dataValidations>"
        )
    parts.append("</worksheet>")
    return "".join(parts)


def write_xlsx(path: str, sheets: list[Sheet]) -> str:
    """Write a real .xlsx (ZIP of SpreadsheetML parts)."""
    n = len(sheets)
    content_types = (
        f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Types xmlns="{_NS_CT}">'
        '<Default Extension="rels" ContentType="application/vnd.'
        'openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/'
        'vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        + "".join(
            f'<Override PartName="/xl/worksheets/sheet{i}.xml" '
            'ContentType="application/vnd.openxmlformats-officedocument.'
            'spreadsheetml.worksheet+xml"/>'
            for i in range(1, n + 1)
        )
        + '<Override PartName="/xl/styles.xml" ContentType="application/'
        'vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>'
        "</Types>"
    )
    root_rels = (
        f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Relationships xmlns="{_NS_PKG_REL}">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/officeDocument" '
        'Target="xl/workbook.xml"/></Relationships>'
    )
    wb_sheets = "".join(
        f'<sheet name="{escape(sh.name)}" sheetId="{i}"'
        + (' state="hidden"' if sh.hidden else "")
        + f' r:id="rId{i}"/>'
        for i, sh in enumerate(sheets, start=1)
    )
    workbook = (
        f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<workbook xmlns="{_NS}" xmlns:r="{_NS_REL}">'
        f"<sheets>{wb_sheets}</sheets></workbook>"
    )
    wb_rels = (
        f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Relationships xmlns="{_NS_PKG_REL}">'
        + "".join(
            f'<Relationship Id="rId{i}" Type="http://schemas.'
            "openxmlformats.org/officeDocument/2006/relationships/"
            f'worksheet" Target="worksheets/sheet{i}.xml"/>'
            for i in range(1, n + 1)
        )
        + f'<Relationship Id="rId{n + 1}" Type="http://schemas.'
        "openxmlformats.org/officeDocument/2006/relationships/styles\" "
        'Target="styles.xml"/></Relationships>'
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", content_types)
        z.writestr("_rels/.rels", root_rels)
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        z.writestr("xl/styles.xml", _STYLES_XML)
        for i, sh in enumerate(sheets, start=1):
            z.writestr(f"xl/worksheets/sheet{i}.xml", _sheet_xml(sh))
    return path


# ---------------- reader (verification / round-trip) -----------------

def _cell_value(c: ET.Element):
    t = c.get("t", "n")
    if t == "inlineStr":
        tel = c.find(f"{{{_NS}}}is/{{{_NS}}}t")
        return tel.text or "" if tel is not None else ""
    v = c.find(f"{{{_NS}}}v")
    if v is None or v.text is None:
        return None
    if t == "b":
        return v.text == "1"
    if t == "str" or t == "s":
        return v.text
    num = float(v.text)
    return int(num) if num.is_integer() and "." not in v.text else num


def read_xlsx(path: str) -> dict:
    """Parse a workbook written by :func:`write_xlsx` (or any simple
    inline-string xlsx) back into dicts for assertions."""
    out: dict = {"sheets": {}, "order": [], "hidden": []}
    with zipfile.ZipFile(path) as z:
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        rel_target = {
            r.get("Id"): r.get("Target")
            for r in rels.iter(f"{{{_NS_PKG_REL}}}Relationship")
        }
        for sh in wb.iter(f"{{{_NS}}}sheet"):
            name = sh.get("name")
            out["order"].append(name)
            if sh.get("state") == "hidden":
                out["hidden"].append(name)
            rid = sh.get(f"{{{_NS_REL}}}id")
            xml = ET.fromstring(z.read("xl/" + rel_target[rid]))
            rows = []
            for row in xml.iter(f"{{{_NS}}}row"):
                cells = {}
                for c in row.iter(f"{{{_NS}}}c"):
                    ref = c.get("r")
                    col = re.match(r"([A-Z]+)", ref).group(1)
                    idx = 0
                    for ch in col:
                        idx = idx * 26 + ord(ch) - 64
                    cells[idx] = (_cell_value(c), int(c.get("s", "0")))
                width = max(cells) if cells else 0
                rows.append([cells.get(i, (None, 0)) for i in range(1, width + 1)])
            widths = {
                int(col.get("min")): float(col.get("width"))
                for col in xml.iter(f"{{{_NS}}}col")
            }
            pane = xml.find(f"{{{_NS}}}sheetViews/{{{_NS}}}sheetView/{{{_NS}}}pane")
            validations = [
                Validation(
                    sqref=dv.get("sqref"),
                    formula=dv.find(f"{{{_NS}}}formula1").text,
                    prompt=dv.get("prompt", ""),
                    error=dv.get("error", ""),
                )
                for dv in xml.iter(f"{{{_NS}}}dataValidation")
            ]
            out["sheets"][name] = {
                "rows": rows,
                "widths": widths,
                "frozen": pane is not None and pane.get("state") == "frozen",
                "validations": validations,
            }
    return out
