# -*- coding: utf-8 -*-
"""datafusion-server-spark data source connector plugin — xlsx.

Drop-in equivalent of the reference's excel plugin (reference
bin/plugins/datasource-plugin-excel/plugin_main.py reads workbooks with
pandas.read_excel). That needs openpyxl; this plugin instead parses the
OOXML container directly with the stdlib (zipfile + ElementTree): an
.xlsx file is a zip holding ``xl/workbook.xml`` (sheet names),
``xl/sharedStrings.xml`` (string table) and ``xl/worksheets/sheetN.xml``
(cells) — enough for tabular data with no third-party dependency.

Location grammar (same as the reference): ``excel://<file>/<sheet>`` —
authority is the workbook file name (resolved against the ``dataDir``
plugin option, or the current directory), path is the sheet name
(defaults to the first sheet).

Supported options (pluginOptions): ``dataDir``, ``hasHeader`` (default
true), ``skipRows``, ``nRows``.
"""

from __future__ import annotations

import os
import re
import zipfile
import xml.etree.ElementTree as ET

import pyarrow as pa

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_CELL_REF = re.compile(r"([A-Z]+)(\d+)")


def _col_index(ref: str) -> int:
    """'A'->0, 'Z'->25, 'AA'->26 ..."""
    idx = 0
    for ch in ref:
        idx = idx * 26 + (ord(ch) - 64)
    return idx - 1


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
    except KeyError:
        return []
    out = []
    for si in root.iter(f"{_NS}si"):
        out.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
    return out


def _sheet_member(zf: zipfile.ZipFile, sheet: str | None) -> str:
    """Resolve a sheet name to its worksheet member path via workbook.xml
    + its relationships; positional fallback when rels are absent."""
    rels_ns = "{http://schemas.openxmlformats.org/package/2006/relationships}"
    rid_ns = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    sheets = list(wb.iter(f"{_NS}sheet"))
    if not sheets:
        raise ValueError("workbook has no sheets")
    target = None
    for pos, sh in enumerate(sheets):
        if sheet in (None, "", sh.get("name")):
            try:
                rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
                rid = sh.get(rid_ns)
                for rel in rels.iter(f"{rels_ns}Relationship"):
                    if rel.get("Id") == rid:
                        target = "xl/" + rel.get("Target").lstrip("/")
            except KeyError:
                target = f"xl/worksheets/sheet{pos + 1}.xml"
            break
    if target is None:
        raise ValueError(f"no such sheet: {sheet!r}")
    return target


def _cell_value(cell, strings: list[str]):
    ctype = cell.get("t", "n")
    if ctype == "inlineStr":
        return "".join(t.text or "" for t in cell.iter(f"{_NS}t"))
    v = cell.find(f"{_NS}v")
    if v is None or v.text is None:
        return None
    if ctype == "s":
        return strings[int(v.text)]
    if ctype == "b":
        return v.text == "1"
    if ctype in ("str", "e"):
        return v.text
    # numeric: keep ints exact
    text = v.text
    try:
        f = float(text)
        return int(f) if f.is_integer() and "e" not in text.lower() else f
    except ValueError:
        return text


def _read_rows(zf: zipfile.ZipFile, member: str, strings: list[str]) -> list[list]:
    root = ET.fromstring(zf.read(member))
    rows: list[list] = []
    for row in root.iter(f"{_NS}row"):
        cells: dict[int, object] = {}
        for cell in row.iter(f"{_NS}c"):
            m = _CELL_REF.match(cell.get("r", ""))
            col = _col_index(m.group(1)) if m else len(cells)
            cells[col] = _cell_value(cell, strings)
        width = max(cells) + 1 if cells else 0
        rows.append([cells.get(i) for i in range(width)])
    return rows


def main(response_format: str, authority: str, path: str, schema, **kwargs):
    """Plugin entry (same contract as the reference excel plugin):
    response_format 'arrow', authority = workbook file, path = sheet."""
    if response_format not in ("arrow", "json", "excel"):
        raise ValueError("Unsupported format: " + response_format)
    file = os.path.join(str(kwargs.get("dataDir", ".")), authority)
    sheet = (path or "").lstrip("/") or None
    has_header = kwargs.get("hasHeader", True)
    skip_rows = int(kwargs.get("skipRows", 0) or 0)
    n_rows = kwargs.get("nRows")

    with zipfile.ZipFile(file) as zf:
        strings = _shared_strings(zf)
        rows = _read_rows(zf, _sheet_member(zf, sheet), strings)

    rows = rows[skip_rows:]
    if not rows:
        return pa.RecordBatch.from_pydict({})
    if has_header:
        header = [str(h) if h is not None else f"col{i}" for i, h in enumerate(rows[0])]
        rows = rows[1:]
        # exported sheets often repeat header names — disambiguate so the
        # column dict below cannot silently drop data
        seen: dict[str, int] = {}
        for i, name in enumerate(header):
            seen[name] = seen.get(name, 0) + 1
            if seen[name] > 1:
                header[i] = f"{name}_{seen[name]}"
    else:
        header = [f"col{i}" for i in range(max(len(r) for r in rows))]
    if n_rows is not None:
        rows = rows[: int(n_rows)]
    width = len(header)
    cols = {
        name: [r[i] if i < len(r) else None for r in rows]
        for i, name in enumerate(header)
        if i < width
    }
    return pa.RecordBatch.from_pydict(cols)
