"""Minimal pure-python xlsx codec — stdlib ``zipfile`` + ``xml.etree`` only.

Closes the reference's spreadsheet surface (write: poi.clj:138 family
``dataset->workbook!``/``workbook->file!``; read: fastexcel.clj:139
``workbook->datasets``) in an environment with no openpyxl/xlrd/POI.
An .xlsx file is a zip of five small XML parts; this module emits and
parses exactly that subset:

* cells typed as number, boolean, or inline/shared string;
* dates/timestamps written as ISO-8601 inline strings (no style table —
  styles exist only to tag number formats, which the reference also
  round-trips through its own typed columns, not Excel display formats);
* one or many worksheets, 1048576-row Excel hard cap enforced.

Spreadsheets are single-machine ingest artifacts (the hard cap is ~1M
rows), so like the reference this is a DRIVER-side bridge by design —
never a distributed scan path.
"""

from __future__ import annotations

import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

EXCEL_MAX_ROWS = 1_048_576
_MAIN_NS = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_REL_NS = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
_PKG_REL_NS = "http://schemas.openxmlformats.org/package/2006/relationships"

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
{sheet_overrides}
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""


def _col_letter(idx: int) -> str:
    """0-based column index -> Excel letters (0->A, 26->AA)."""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _col_index(ref: str) -> int:
    """Cell reference 'BC12' -> 0-based column index (54)."""
    n = 0
    for ch in ref:
        if ch.isdigit():
            break
        n = n * 26 + (ord(ch) - ord("A") + 1)
    return n - 1


def _cell_xml(ref: str, value) -> str:
    if value is None:
        return ""
    if isinstance(value, bool):
        return f'<c r="{ref}" t="b"><v>{1 if value else 0}</v></c>'
    if isinstance(value, (int, float)):
        if isinstance(value, float) and \
                (value != value or value in (float("inf"), float("-inf"))):
            return ""  # xlsx numerics have no NaN/Inf: blank cell
        return f'<c r="{ref}"><v>{value!r}</v></c>'
    # everything else (str, date, timestamp, Decimal) -> inline string
    return (f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
            f"{escape(str(value))}</t></is></c>")


def write_workbook(path: str, sheets: dict[str, tuple[list[str], list]]):
    """Write ``{sheet_name: (column_names, rows)}`` as an .xlsx file.

    ``rows`` is any iterable of sequences. Raises if a sheet exceeds the
    Excel hard cap (header included) — the caller is the bounded driver
    bridge, so this is a loud guard, not a truncation.
    """
    if not sheets:
        raise ValueError("write_workbook: at least one sheet required")
    sheet_list, overrides, wb_rels = [], [], []
    parts: dict[str, str] = {}
    for i, (name, (cols, rows)) in enumerate(sheets.items(), start=1):
        body = [f"<row r=\"1\">" + "".join(
            _cell_xml(f"{_col_letter(c)}1", col)
            for c, col in enumerate(cols)) + "</row>"]
        r = 1
        for row in rows:
            r += 1
            if r > EXCEL_MAX_ROWS:
                raise ValueError(
                    f"sheet {name!r} exceeds Excel's {EXCEL_MAX_ROWS}-row "
                    f"cap; write parquet/csv for data this size")
            cells = "".join(_cell_xml(f"{_col_letter(c)}{r}", v)
                            for c, v in enumerate(row))
            body.append(f'<row r="{r}">{cells}</row>')
        parts[f"xl/worksheets/sheet{i}.xml"] = (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<worksheet xmlns="{_MAIN_NS}"><sheetData>'
            + "".join(body) + "</sheetData></worksheet>")
        overrides.append(
            f'<Override PartName="/xl/worksheets/sheet{i}.xml" ContentType='
            '"application/vnd.openxmlformats-officedocument.spreadsheetml.'
            'worksheet+xml"/>')
        # escape() alone leaves double quotes — malformed inside an attribute
        sheet_list.append(
            f'<sheet name="{escape(name, {chr(34): "&quot;"})}" '
            f'sheetId="{i}" r:id="rId{i}"/>')
        wb_rels.append(
            f'<Relationship Id="rId{i}" Type="{_REL_NS}/worksheet" '
            f'Target="worksheets/sheet{i}.xml"/>')

    parts["xl/workbook.xml"] = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<workbook xmlns="{_MAIN_NS}" xmlns:r="{_REL_NS}"><sheets>'
        + "".join(sheet_list) + "</sheets></workbook>")
    parts["xl/_rels/workbook.xml.rels"] = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Relationships xmlns="{_PKG_REL_NS}">'
        + "".join(wb_rels) + "</Relationships>")
    parts["[Content_Types].xml"] = _CONTENT_TYPES.format(
        sheet_overrides="".join(overrides))
    parts["_rels/.rels"] = _ROOT_RELS

    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, data in parts.items():
            zf.writestr(name, data)


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        raw = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    root = ET.fromstring(raw)
    out = []
    for si in root.findall(f"{{{_MAIN_NS}}}si"):
        # an <si> may be one <t> or multiple rich-text <r><t> runs
        out.append("".join(t.text or ""
                           for t in si.iter(f"{{{_MAIN_NS}}}t")))
    return out


def _cell_value(cell, shared: list[str]):
    ctype = cell.get("t", "n")
    if ctype == "inlineStr":
        return "".join(t.text or ""
                       for t in cell.iter(f"{{{_MAIN_NS}}}t"))
    v = cell.find(f"{{{_MAIN_NS}}}v")
    if v is None or v.text is None:
        return None
    if ctype == "s":
        return shared[int(v.text)]
    if ctype == "b":
        return v.text == "1"
    if ctype == "str":  # cached formula result
        return v.text
    # numeric: int when exact, else float
    f = float(v.text)
    return int(f) if f.is_integer() and "e" not in v.text.lower() \
        and "." not in v.text else f


def read_workbook(path: str) -> dict[str, tuple[list[str], list[list]]]:
    """Read an .xlsx file -> ``{sheet_name: (header_row, data_rows)}``.

    Handles shared, inline, and formula-cached strings, booleans, and
    sparse rows (missing cells -> None, positioned by the cell ref).
    The first row is returned as the header; ragged rows are padded.
    """
    out: dict[str, tuple[list[str], list[list]]] = {}
    with zipfile.ZipFile(path) as zf:
        shared = _shared_strings(zf)
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
        targets = {rel.get("Id"): rel.get("Target")
                   for rel in rels.findall(f"{{{_PKG_REL_NS}}}Relationship")}
        for sheet in wb.iter(f"{{{_MAIN_NS}}}sheet"):
            rid = sheet.get(f"{{{_REL_NS}}}id")
            target = targets.get(rid, "")
            if target.startswith("/"):
                target = target[1:]
            elif not target.startswith("xl/"):
                target = "xl/" + target
            root = ET.fromstring(zf.read(target))
            rows: list[list] = []
            width = 0
            for row in root.iter(f"{{{_MAIN_NS}}}row"):
                vals: list = []
                for cell in row.findall(f"{{{_MAIN_NS}}}c"):
                    ref = cell.get("r")
                    idx = _col_index(ref) if ref else len(vals)
                    while len(vals) <= idx:
                        vals.append(None)
                    vals[idx] = _cell_value(cell, shared)
                width = max(width, len(vals))
                rows.append(vals)
            for r in rows:
                r.extend([None] * (width - len(r)))
            header = [str(c) if c is not None else f"column-{i}"
                      for i, c in enumerate(rows[0])] if rows else []
            out[sheet.get("name")] = (header, rows[1:])
    return out
