"""Dependency-free XLSX read/write (SURVEY §2.1 S5).

The reference reads multi-sheet fee-schedule workbooks with
pandas+openpyxl (prod_etl/utils/excel_extractor.py:14-44). openpyxl is not
in this container, and the files involved are tiny driver-side dims — so
instead of gating S5 behind a missing dependency, this module speaks the
minimal OOXML subset directly with stdlib ``zipfile`` + ``ElementTree``:

* reader: workbook.xml (sheet names) → workbook.xml.rels (sheet targets)
  → worksheets/sheetN.xml (sheetData), resolving sharedStrings, inline
  strings, booleans and numerics; first row is the header.
* writer: inline-string / numeric cells only — enough to round-trip the
  reader and to emit small report workbooks.

Scale note: XLSX is not a lake format; this is a *driver-side* source for
small reference dims (≤ a few MB), after which the data lives in a
DataFrame and is broadcast-joined. Large tabular data belongs in parquet.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

_CELL_REF = re.compile(r"([A-Z]+)(\d+)")


def _col_index(ref: str) -> int:
    """'A1' → 0, 'AB7' → 27 (0-based column index from a cell reference)."""
    m = _CELL_REF.match(ref)
    if not m:
        return 0
    idx = 0
    for ch in m.group(1):
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def _col_letter(idx: int) -> str:
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _cell_value(cell: ET.Element, shared: list[str]):
    ctype = cell.get("t", "n")
    if ctype == "inlineStr":
        return "".join(t.text or "" for t in cell.iterfind(".//{*}t"))
    v = cell.find("{*}v")
    if v is None or v.text is None:
        return None
    if ctype == "s":
        return shared[int(v.text)]
    if ctype == "b":
        return v.text == "1"
    if ctype == "str":
        return v.text
    num = float(v.text)
    return int(num) if num.is_integer() else num


def load_workbook_rows(path: str) -> dict[str, tuple[list[str], list[list]]]:
    """Parse every sheet of an .xlsx → {sheet_name: (header, data_rows)}.

    Header = first row's string values; data rows are padded/truncated to
    the header width. Cell types follow the OOXML cell ``t`` attribute
    (shared string / inline string / bool / numeric); integral floats
    collapse to int, matching pandas.read_excel's round-trip of
    integer-valued columns.
    """
    # `iterfind` (not `iter`) — only path-based matching understands the
    # `{*}` namespace wildcard, and namespace-agnostic matching keeps the
    # parser working on both strict and transitional OOXML producers.
    ns_rel = (
        "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"
    )
    with zipfile.ZipFile(path) as zf:
        names = set(zf.namelist())

        shared: list[str] = []
        if "xl/sharedStrings.xml" in names:
            root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
            shared = [
                "".join(t.text or "" for t in si.iterfind(".//{*}t"))
                for si in root.iterfind("{*}si")
            ]

        rels: dict[str, str] = {}
        if "xl/_rels/workbook.xml.rels" in names:
            root = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
            for rel in root.iterfind("{*}Relationship"):
                target = rel.get("Target", "").lstrip("/")
                if not target.startswith("xl/"):
                    target = "xl/" + target
                rels[rel.get("Id", "")] = target

        out: dict[str, tuple[list[str], list[list]]] = {}
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        for i, sheet in enumerate(wb.iterfind(".//{*}sheet")):
            name = sheet.get("name", f"Sheet{i + 1}")
            target = rels.get(
                sheet.get(ns_rel, ""), f"xl/worksheets/sheet{i + 1}.xml"
            )
            rows: list[list] = []
            sheet_root = ET.fromstring(zf.read(target))
            for row in sheet_root.iterfind(".//{*}row"):
                cells: list = []
                for cell in row.iterfind("{*}c"):
                    ci = _col_index(cell.get("r", ""))
                    while len(cells) <= ci:
                        cells.append(None)
                    cells[ci] = _cell_value(cell, shared)
                rows.append(cells)
            if not rows:
                out[name] = ([], [])
                continue
            header = [str(v) if v is not None else f"col{j}" for j, v in enumerate(rows[0])]
            width = len(header)
            data = [(r + [None] * width)[:width] for r in rows[1:]]
            out[name] = (header, data)
        return out


def write_workbook(path: str, sheets: dict[str, tuple[list[str], list[list]]]) -> None:
    """Write {sheet_name: (header, rows)} as a minimal valid .xlsx.

    Strings become inline strings (no sharedStrings part), numbers become
    numeric cells, None is an omitted cell — the exact subset
    :func:`load_workbook_rows` reads back."""

    def cell_xml(ref: str, v) -> str:
        if v is None:
            return ""
        if isinstance(v, bool):
            return f'<c r="{ref}" t="b"><v>{int(v)}</v></c>'
        if isinstance(v, (int, float)):
            return f'<c r="{ref}"><v>{v}</v></c>'
        return f'<c r="{ref}" t="inlineStr"><is><t>{escape(str(v))}</t></is></c>'

    def sheet_xml(header: list[str], rows: list[list]) -> str:
        all_rows = [list(header)] + [list(r) for r in rows]
        body = "".join(
            '<row r="%d">%s</row>'
            % (
                ri + 1,
                "".join(
                    cell_xml(f"{_col_letter(ci)}{ri + 1}", v)
                    for ci, v in enumerate(row)
                ),
            )
            for ri, row in enumerate(all_rows)
        )
        return (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
            f"<sheetData>{body}</sheetData></worksheet>"
        )

    names = list(sheets)
    ct = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        + "".join(
            f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
            'ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
            for i in range(len(names))
        )
        + "</Types>"
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" '
        'Target="xl/workbook.xml"/></Relationships>'
    )
    wb = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        "<sheets>"
        + "".join(
            f'<sheet name="{escape(n)}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
            for i, n in enumerate(names)
        )
        + "</sheets></workbook>"
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        + "".join(
            f'<Relationship Id="rId{i + 1}" '
            'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(names))
        )
        + "</Relationships>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", ct)
        zf.writestr("_rels/.rels", root_rels)
        zf.writestr("xl/workbook.xml", wb)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        for i, name in enumerate(names):
            header, rows = sheets[name]
            zf.writestr(f"xl/worksheets/sheet{i + 1}.xml", sheet_xml(header, rows))
