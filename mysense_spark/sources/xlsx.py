"""Minimal REAL XLSX codec — pure stdlib (zipfile + xml.etree), no
openpyxl/xlsxwriter required. An .xlsx file is a ZIP of XML parts; the
subset a measurement sheet or a region report needs (one worksheet,
strings + numbers) is small enough to read and write directly, the same
way the multimodal module decodes WAV/netpbm/BMP without codec
libraries. Reference shapes: SamenMetenTools/Things2XLSX.py (K7 report
writer), the XLSX measurement sheets S8 ingests.

Reader notes: cells carry their A1-style reference, so sparse rows (a
blank cell is simply absent from the XML) are placed by COLUMN, not by
position; shared strings (`t="s"`), inline strings (`t="inlineStr"`)
and plain numbers are supported — the three cell types real producers
emit for tabular data.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"


def _col_letter(idx: int) -> str:
    """0-based column index -> A1 letters (0 -> A, 26 -> AA)."""
    s = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        s = chr(ord("A") + rem) + s
    return s


def _col_index(ref: str) -> int:
    """A1-style cell reference -> 0-based column index."""
    letters = re.match(r"[A-Z]+", ref)
    if not letters:
        raise ValueError(f"malformed cell reference {ref!r}")
    idx = 0
    for ch in letters.group(0):
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def write_xlsx(rows: list[dict], path: str, sheet: str = "summary") -> None:
    """Write a list of uniform dicts as a single-sheet XLSX: header row
    from the first dict's keys, strings as inline strings (no
    sharedStrings part needed), ints/floats as native numbers, None as
    a blank (absent) cell."""
    headers = list(rows[0].keys()) if rows else []

    def cell(r: int, c: int, v) -> str:
        ref = f"{_col_letter(c)}{r + 1}"
        if v is None:
            return ""
        if isinstance(v, bool):
            return f'<c r="{ref}" t="b"><v>{int(v)}</v></c>'
        if isinstance(v, float) and (v != v or v in (float("inf"), float("-inf"))):
            # NaN/inf are not valid OOXML numbers — Excel would refuse
            # the whole file; a blank cell is the honest rendering
            return ""
        if isinstance(v, (int, float)):
            return f'<c r="{ref}"><v>{v!r}</v></c>'
        return f'<c r="{ref}" t="inlineStr"><is><t>{escape(str(v))}</t></is></c>'

    body = []
    body.append(
        "<row r=\"1\">" + "".join(cell(0, c, h) for c, h in enumerate(headers)) + "</row>"
    )
    for r, row in enumerate(rows, start=1):
        body.append(
            f'<row r="{r + 1}">'
            + "".join(cell(r, c, row.get(h)) for c, h in enumerate(headers))
            + "</row>"
        )
    sheet_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        "<sheetData>" + "".join(body) + "</sheetData></worksheet>"
    )
    from xml.sax.saxutils import quoteattr

    workbook_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        # quoteattr, not escape: attribute context must escape quotes
        # too, or a sheet name containing one corrupts the workbook
        f'<sheets><sheet name={quoteattr(sheet)} sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
        'Target="worksheets/sheet1.xml"/></Relationships>'
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" '
        'Target="xl/workbook.xml"/></Relationships>'
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" '
        'ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/></Types>'
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", content_types)
        z.writestr("_rels/.rels", root_rels)
        z.writestr("xl/workbook.xml", workbook_xml)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        z.writestr("xl/worksheets/sheet1.xml", sheet_xml)


def read_xlsx(path: str) -> list[dict]:
    """Read the first worksheet back as a list of dicts keyed on the
    header row. Numbers come back as float (int when integral), shared
    and inline strings as str, missing cells as None."""
    with zipfile.ZipFile(path) as z:
        names = z.namelist()
        shared: list[str] = []
        if "xl/sharedStrings.xml" in names:
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.iter(f"{_NS}si"):
                # only direct <t> and rich-run <r><t> text — NOT the
                # <rPh> phonetic (furigana) runs Japanese-locale Excel
                # embeds, which would concatenate into the string
                parts = [t.text or "" for t in si.findall(f"{_NS}t")]
                for run in si.findall(f"{_NS}r"):
                    parts.extend(t.text or "" for t in run.findall(f"{_NS}t"))
                shared.append("".join(parts))
        # "first sheet" by the NUMBER in the part name, not lexicographic
        # order (sheet10.xml sorts before sheet2.xml; Excel does not
        # renumber parts when sheets are deleted)
        sheet_names = sorted(
            (n for n in names if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)),
            key=lambda n: int(re.search(r"\d+", n).group(0)),
        )
        if not sheet_names:
            raise ValueError(f"{path}: no worksheet part found")
        root = ET.fromstring(z.read(sheet_names[0]))

    rows: dict[int, dict[int, object]] = {}
    next_row = 0
    for row in root.iter(f"{_NS}row"):
        r = int(row.get("r")) - 1 if row.get("r") else next_row
        next_row = r + 1
        cells: dict[int, object] = {}
        next_col = 0  # positional fallback: count EVERY cell element,
        for c in row.iter(f"{_NS}c"):  # including empty ones, or a
            ref = c.get("r")  # skipped blank shifts later values left
            col = _col_index(ref) if ref else next_col
            next_col = col + 1
            ctype = c.get("t", "n")
            if ctype == "inlineStr":
                cells[col] = "".join(
                    t.text or "" for t in c.iter(f"{_NS}t")
                )
                continue
            v = c.find(f"{_NS}v")
            if v is None or v.text is None:
                continue
            if ctype == "s":
                cells[col] = shared[int(v.text)]
            elif ctype == "b":
                cells[col] = v.text in ("1", "true")  # xsd:boolean admits both
            elif ctype == "str":  # formula cached string result
                cells[col] = v.text
            else:
                # integers parse as int directly: float() first would
                # silently round anything >= 2^53 (ns timestamps, ids)
                txt = v.text
                if re.fullmatch(r"-?\d+", txt):
                    cells[col] = int(txt)
                else:
                    x = float(txt)
                    cells[col] = int(x) if x.is_integer() else x
        rows[r] = cells
    if not rows:
        return []
    header_row = rows.pop(min(rows))
    # width from ALL rows, not just the header: a ragged sheet (data
    # beyond the last header cell) must not silently drop columns
    n_cols = max(
        [(max(header_row) + 1) if header_row else 0]
        + [(max(c) + 1) if c else 0 for c in rows.values()]
    )
    headers = [str(header_row.get(i, f"col{i}")) for i in range(n_cols)]
    if len(set(headers)) != len(headers):
        raise ValueError(
            f"{path}: duplicate header names {headers} — a dict row would "
            f"silently keep only the rightmost duplicate column"
        )
    out = []
    for r in sorted(rows):
        cells = rows[r]
        out.append({headers[i]: cells.get(i) for i in range(n_cols)})
    return out
