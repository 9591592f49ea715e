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

import functools
import re
import zipfile
import zlib
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"

# Error contract of the READ surface (r11 fuzz hardening): a malformed
# file raises ValueError — never the zip/zlib/XML layer's own types.
# The mutation battery (tests/test_property.py) surfaced every member
# of this set from byte-flipped/truncated/spliced real workbooks:
# BadZipFile (magic/CRC), zlib.error (corrupt deflate stream),
# ParseError (broken XML), OverflowError (absurd serial dates),
# EOFError (truncated member), RuntimeError ("encrypted" flag bits),
# NotImplementedError (zipfile's patched-data flag bit).
# Deliberately NOT here (r12 advice — a code bug must stay loud):
# KeyError (normalized only at the zip member-access site, _read_part),
# IndexError (the shared-string index is bounds-checked in place), and
# RecursionError (RuntimeError subclass, re-raised before this set).
_MALFORMED = (
    zipfile.BadZipFile,
    zlib.error,
    ET.ParseError,
    OverflowError,
    EOFError,
    RuntimeError,
    NotImplementedError,
    UnicodeDecodeError,
)


def _quarantined(fn):
    """Normalize the malformed-file error surface to ValueError
    (quarantine-don't-guess, the media-codec contract). Genuine I/O
    errors (missing file, permissions) propagate unchanged; so does
    TypeError — a code bug must stay loud, not dress up as a bad file.
    OSError from INSIDE a parse (zipfile seeking through a corrupt
    central directory) counts as malformed."""

    @functools.wraps(fn)
    def run(path, *args, **kwargs):
        try:
            return fn(path, *args, **kwargs)
        except RecursionError:
            # RuntimeError subclass, but a recursion blow-up (pathological
            # nesting or a parser bug) is a defect to surface, not a
            # malformed file to quarantine silently
            raise
        except _MALFORMED as exc:
            # ordered BEFORE the ValueError pass-through: UnicodeDecodeError
            # subclasses ValueError and must still get the normalized message
            raise ValueError(
                f"{path}: malformed XLSX ({type(exc).__name__}: {exc})"
            ) from exc
        except ValueError:
            raise
        except OSError as exc:
            if isinstance(exc, (FileNotFoundError, PermissionError, IsADirectoryError)):
                raise
            raise ValueError(
                f"{path}: malformed XLSX ({type(exc).__name__}: {exc})"
            ) from exc

    return run


def _read_part(z: zipfile.ZipFile, name: str) -> bytes:
    """Zip member read with zipfile's KeyError (member vanished between
    namelist and read — corrupt central directory) normalized HERE, at
    the only access site where KeyError means 'bad file'. A KeyError
    anywhere else in the parser is a code bug and propagates (r12
    advice: don't quarantine bad dict lookups as malformed input)."""
    try:
        return z.read(name)
    except KeyError as exc:
        # keep the documented '{path}: malformed XLSX' prefix every other
        # malformed-file class gets (z.filename is the open archive path)
        raise ValueError(
            f"{z.filename}: malformed XLSX (KeyError: unreadable part {name!r})"
        ) from exc


def _col_letter(idx: int) -> str:
    """0-based column index -> A1 letters (0 -> A, 26 -> AA)."""
    s = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        s = chr(ord("A") + rem) + s
    return s


# The OOXML worksheet grid is bounded (ECMA-376 §18.3.1.73: columns
# A..XFD = 16384, rows 1..1048576). Excel itself cannot write a
# reference outside it, so one in a file is malformed input, not data —
# and the reader DENSE-FILLS rows to the max column seen, so without
# this bound a 200-byte workbook claiming column ZZZZZZZ (index ~8e9)
# allocates billions of header cells (r14 structural battery catch:
# the hang/OOM class, same genus as the REST 400-digit-int killer).
_MAX_COL = 16384
_MAX_ROW = 1_048_576


def _col_index(ref: str) -> int:
    """A1-style cell reference -> 0-based column index (grid-bounded)."""
    letters = re.match(r"[A-Z]+", ref)
    if not letters:
        raise ValueError(f"malformed cell reference {ref!r}")
    idx = 0
    for ch in letters.group(0):
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    if idx > _MAX_COL:
        raise ValueError(
            f"cell reference {ref!r} outside the worksheet grid "
            f"(max column {_col_letter(_MAX_COL - 1)})"
        )
    return idx - 1


def _rich_text(el) -> str:
    """Concatenated text of a rich-text container (<si> or <is>): direct
    <t> children plus rich-run <r><t> — NOT the <rPh> phonetic (furigana)
    runs Japanese-locale Excel embeds, which would concatenate into the
    string. ONE helper for both the sharedStrings and inline-string
    paths so the rPh rule cannot drift between them."""
    parts = [t.text or "" for t in el.findall(f"{_NS}t")]
    for run in el.findall(f"{_NS}r"):
        parts.extend(t.text or "" for t in run.findall(f"{_NS}t"))
    return "".join(parts)


def write_xlsx(rows: list[dict], path: str, sheet: str = "summary") -> None:
    """Write a list of uniform dicts as a single-sheet XLSX: header row
    from the first dict's keys, strings as inline strings (no
    sharedStrings part needed), ints/floats as native numbers, None as
    a blank (absent) cell. Multi-sheet: pass `write_xlsx_sheets`."""
    write_xlsx_sheets({sheet: rows}, path)


_SHEET_FORBIDDEN = set("[]:*?/\\")


def _sheet_names(raw: list[str]) -> list[str]:
    """Deterministically mangle raw sheet names into what Excel accepts
    (quoteattr alone keeps the XML well-formed, but Excel REPAIRS or
    rejects workbooks whose sheet names are empty, exceed 31 chars,
    contain []:*?/\\, begin/end with an apostrophe, or collide
    case-insensitively): forbidden chars -> '_', edge apostrophes
    stripped, 31-char cap, and case-insensitive collisions suffixed
    ~2, ~3, ... (re-capped so the suffix always fits). Same input order
    -> same output names, so reports stay byte-deterministic."""
    out: list[str] = []
    seen: set[str] = set()
    for i, name in enumerate(raw):
        s = "".join("_" if ch in _SHEET_FORBIDDEN else ch for ch in str(name))
        # cap BEFORE the edge-apostrophe strip, then strip again: the
        # 31-char truncation can itself expose a trailing apostrophe
        # (e.g. 30 chars + "'" + tail), which Excel rejects like any
        # other apostrophe edge
        s = s.strip("'")[:31].strip("'") or f"sheet{i + 1}"
        base, n = s, 1
        while s.casefold() in seen:
            n += 1
            tag = f"~{n}"
            s = base[: 31 - len(tag)] + tag
        seen.add(s.casefold())
        out.append(s)
    return out


def write_xlsx_sheets(sheets: dict[str, list[dict]], path: str) -> list[str]:
    """Write several named worksheets into one workbook — the reference's
    per-region report shape (SamenMetenTools/Things2XLSX.py writes one
    sheet per municipality). Sheet order = dict order. Sheet names pass
    through _sheet_names (Excel's rules are stricter than XML's);
    returns the names actually written, in order."""
    if not sheets:
        raise ValueError("write_xlsx_sheets: need at least one sheet")
    names = _sheet_names(list(sheets))

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

    def sheet_xml(rows: list[dict]) -> str:
        headers = list(rows[0].keys()) if rows else []
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
        return (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
            "<sheetData>" + "".join(body) + "</sheetData></worksheet>"
        )

    from xml.sax.saxutils import quoteattr

    # quoteattr, not escape: attribute context must escape quotes
    # too, or a sheet name containing one corrupts the workbook
    sheet_tags = "".join(
        f'<sheet name={quoteattr(name)} sheetId="{i + 1}" r:id="rId{i + 1}"/>'
        for i, name in enumerate(names)
    )
    workbook_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f"<sheets>{sheet_tags}</sheets></workbook>"
    )
    rel_tags = "".join(
        f'<Relationship Id="rId{i + 1}" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
        f'Target="worksheets/sheet{i + 1}.xml"/>'
        for i in range(len(sheets))
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        f"{rel_tags}</Relationships>"
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" '
        'Target="xl/workbook.xml"/></Relationships>'
    )
    sheet_overrides = "".join(
        f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        for i in range(len(sheets))
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" '
        'ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        f"{sheet_overrides}</Types>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", content_types)
        z.writestr("_rels/.rels", root_rels)
        z.writestr("xl/workbook.xml", workbook_xml)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        for i, rows in enumerate(sheets.values()):
            z.writestr(f"xl/worksheets/sheet{i + 1}.xml", sheet_xml(rows))
    return names


_REL_NS = "{http://schemas.openxmlformats.org/package/2006/relationships}"
_DOC_NS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"


def _workbook_sheets(z: zipfile.ZipFile, names: list[str]) -> list[tuple[str, str]]:
    """[(sheet name, zip part path)] in workbook order, resolved via
    workbook.xml + its rels — the authoritative mapping (part NUMBERS lie
    once sheets are deleted or reordered; Excel does not renumber).
    Returns [] when either part is absent/unreadable so the caller can
    fall back to part-number order."""
    if "xl/workbook.xml" not in names or "xl/_rels/workbook.xml.rels" not in names:
        return []
    try:
        wb = ET.fromstring(_read_part(z, "xl/workbook.xml"))
        rels = ET.fromstring(_read_part(z, "xl/_rels/workbook.xml.rels"))
    except ET.ParseError:
        return []
    targets: dict[str, str] = {}
    for rel in rels.iter(f"{_REL_NS}Relationship"):
        tgt = rel.get("Target", "")
        # Target is relative to xl/ unless absolute ("/xl/worksheets/..")
        part = tgt.lstrip("/") if tgt.startswith("/") else f"xl/{tgt}"
        targets[rel.get("Id", "")] = part
    out = []
    for sheet in wb.iter(f"{_NS}sheet"):
        part = targets.get(sheet.get(f"{_DOC_NS}id", ""))
        if part in names:
            out.append((sheet.get("name", ""), part))
    return out


# builtin number-format ids that render as dates/times (ECMA-376 §18.8.30)
_BUILTIN_DATE_FMTS = (
    frozenset(range(14, 23)) | frozenset(range(27, 37)) | frozenset(range(45, 48)) | frozenset(range(50, 59))
)


def _date_styles(z: zipfile.ZipFile, names: list[str]) -> frozenset[int]:
    """The cellXfs style indices whose number format renders a NUMBER as
    a date/time — the 'dates-as-styles' tier that used to need openpyxl:
    Excel stores a date cell as a plain serial number plus a style
    reference, so without styles.xml a date column reads back as floats.
    Builtin ids per the spec table; custom formats by the standard
    heuristic (any y/m/d/h/s date token AFTER stripping quoted literals,
    [..] sections, and escapes — '0.00' and '\"mm\" units' stay numeric).
    Empty set when styles.xml is absent/unreadable (values then stay
    numeric — degraded, never wrong types invented)."""
    if "xl/styles.xml" not in names:
        return frozenset()
    try:
        root = ET.fromstring(_read_part(z, "xl/styles.xml"))
    except ET.ParseError:
        return frozenset()
    custom: dict[int, str] = {}
    for nf in root.iter(f"{_NS}numFmt"):
        try:
            custom[int(nf.get("numFmtId"))] = nf.get("formatCode") or ""
        except (TypeError, ValueError):
            continue

    def is_date(fmt_id: int) -> bool:
        if fmt_id in _BUILTIN_DATE_FMTS:
            return True
        code = custom.get(fmt_id)
        if not code:
            return False
        bare = re.sub(r'"[^"]*"|\[[^\]]*\]|\\.', "", code)
        return bool(re.search(r"[ymdhs]", bare, re.IGNORECASE))

    cell_xfs = root.find(f"{_NS}cellXfs")
    if cell_xfs is None:
        return frozenset()
    out = set()
    for i, xf in enumerate(cell_xfs.findall(f"{_NS}xf")):
        try:
            if is_date(int(xf.get("numFmtId", "0"))):
                out.add(i)
        except ValueError:
            continue
    return frozenset(out)


def _uses_1904_epoch(z: zipfile.ZipFile, names: list[str]) -> bool:
    """Mac Excel's 1904 date system, declared on workbookPr — reading a
    1904-epoch serial against the 1900 epoch shifts every date by four
    years and a day, so the flag must be honored, not assumed."""
    if "xl/workbook.xml" not in names:
        return False
    try:
        wb = ET.fromstring(_read_part(z, "xl/workbook.xml"))
    except ET.ParseError:
        return False
    pr = wb.find(f"{_NS}workbookPr")
    return pr is not None and pr.get("date1904", "0").lower() in ("1", "true")


def _serial_to_datetime(x, date1904: bool):
    """Excel serial day count -> datetime. Epoch 1899-12-30 absorbs the
    deliberate Lotus 1-2-3 leap-year bug for every serial >= 61 (all
    post-Feb-1900 dates — i.e. any real measurement); 1904-01-00 under
    the Mac system. Sub-day fractions round to the microsecond, the same
    stabilization openpyxl applies to float serial jitter."""
    import datetime as dt

    base = dt.datetime(1904, 1, 1) if date1904 else dt.datetime(1899, 12, 30)
    return base + dt.timedelta(microseconds=round(float(x) * 86_400_000_000))


@_quarantined
def list_sheets(path: str) -> list[str]:
    """Worksheet names in workbook order (empty list when the workbook
    part is missing — a part-number-only file)."""
    with zipfile.ZipFile(path) as z:
        return [n for n, _ in _workbook_sheets(z, z.namelist())]


@_quarantined
def read_xlsx(path: str, sheet: str | int = 0) -> list[dict]:
    """Read one worksheet back as a list of dicts keyed on the header
    row. Numbers come back as float (int when integral), shared and
    inline strings as str, missing cells as None. `sheet` selects by
    workbook name or by 0-based workbook-order index (default: first)."""
    with zipfile.ZipFile(path) as z:
        names = z.namelist()
        shared: list[str] = []
        if "xl/sharedStrings.xml" in names:
            root = ET.fromstring(_read_part(z, "xl/sharedStrings.xml"))
            shared = [_rich_text(si) for si in root.iter(f"{_NS}si")]
        date_styles = _date_styles(z, names)
        date1904 = _uses_1904_epoch(z, names)
        book = _workbook_sheets(z, names)
        if isinstance(sheet, str):
            by_name = dict(book)
            if sheet not in by_name:
                raise ValueError(
                    f"{path}: no worksheet named {sheet!r}; have "
                    f"{[n for n, _ in book]}"
                )
            part = by_name[sheet]
        elif book:
            if not 0 <= sheet < len(book):
                raise ValueError(
                    f"{path}: sheet index {sheet} out of range ({len(book)} sheets)"
                )
            part = book[sheet][1]
        else:
            # workbook part absent: fall back to the part NUMBER, not
            # lexicographic order (sheet10.xml sorts before sheet2.xml)
            sheet_parts = sorted(
                (n for n in names if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)),
                key=lambda n: int(re.search(r"\d+", n).group(0)),
            )
            if not 0 <= sheet < len(sheet_parts):
                raise ValueError(f"{path}: no worksheet part for index {sheet}")
            part = sheet_parts[sheet]
        root = ET.fromstring(_read_part(z, part))

    rows: dict[int, dict[int, object]] = {}
    next_row = 0
    for row in root.iter(f"{_NS}row"):
        r = int(row.get("r")) - 1 if row.get("r") else next_row
        if not 0 <= r < _MAX_ROW:
            raise ValueError(
                f"row reference {r + 1} outside the worksheet grid "
                f"(1..{_MAX_ROW})"
            )
        next_row = r + 1
        cells: dict[int, object] = {}
        next_col = 0  # positional fallback: count EVERY cell element,
        for c in row.iter(f"{_NS}c"):  # including empty ones, or a
            ref = c.get("r")  # skipped blank shifts later values left
            col = _col_index(ref) if ref else next_col
            next_col = col + 1
            ctype = c.get("t", "n")
            if ctype == "inlineStr":
                is_el = c.find(f"{_NS}is")
                # same rPh-skipping parse as sharedStrings <si> — c.iter
                # would recurse into phonetic runs and concatenate them
                cells[col] = _rich_text(is_el) if is_el is not None else ""
                continue
            v = c.find(f"{_NS}v")
            if v is None or v.text is None:
                continue
            if ctype == "s":
                # bounds-checked in place (not via a broad IndexError
                # quarantine): a negative index would otherwise silently
                # wrap to the END of the shared-string table
                idx = int(v.text)
                if not 0 <= idx < len(shared):
                    raise ValueError(
                        f"{path}: shared-string index {idx} out of range "
                        f"({len(shared)} strings)"
                    )
                cells[col] = shared[idx]
            elif ctype == "b":
                cells[col] = v.text in ("1", "true")  # xsd:boolean admits both
            elif ctype == "str":  # formula cached string result
                cells[col] = v.text
            else:
                txt = v.text
                style = c.get("s")
                if style is not None and style.isdigit() and int(style) in date_styles:
                    # dates-as-styles (r9): a date cell is a serial
                    # number plus a date-formatted style — convert here
                    # so date columns read back as datetimes, not floats
                    cells[col] = _serial_to_datetime(txt, date1904)
                    continue
                # integers parse as int directly: float() first would
                # silently round anything >= 2^53 (ns timestamps, ids)
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
