"""ODS spreadsheet driver (ogr/ogrsf_frmts/ods — re-derived).

Facts: content.xml office:spreadsheet tables; table:table-row with
table:number-rows-repeated; table:table-cell with office:value-type
(string/float/percentage/currency/boolean/date/time), office:value /
office:date-value (T separates date from datetime) / office:time-value
(PTxxHxxMxxS), table:number-columns-repeated, and text:p content
(multiple <text:p> join with newlines). Trailing repeated empty
cells/rows are trimmed; header detection and column-type merging are
shared with the XLSX driver.
"""

from __future__ import annotations

import io
import re
import xml.etree.ElementTree as ET
import zipfile

from gdal_spark.sources.xlsx import _rows_to_layer

__all__ = ["ods_layers", "read_ods"]


def _strip(tag):
    return tag.rsplit("}", 1)[-1]


def _attr(el, name):
    for k, v in el.attrib.items():
        if _strip(k) == name:
            return v
    return None


_TIME_RE = re.compile(r"PT(\d+)H(\d+)M([\d.]+)S")


def _cell_value(cell):
    vt = _attr(cell, "value-type")
    if vt is None:
        texts = ["".join(p.itertext()) for p in cell
                 if _strip(p.tag) == "p"]
        if texts:
            return ("string", "\n".join(texts))
        return None
    if vt in ("float", "percentage", "currency"):
        raw = _attr(cell, "value") or "0"
        if re.fullmatch(r"[+-]?\d+", raw):
            return ("integer", int(raw))
        return ("float", float(raw))
    if vt == "boolean":
        return ("integer",
                1 if (_attr(cell, "boolean-value") == "true") else 0)
    if vt == "date":
        raw = _attr(cell, "date-value") or ""
        if "T" in raw:
            d, t = raw.split("T", 1)
            return ("datetime", "%s %s" % (d.replace("-", "/"), t[:8]))
        return ("date", raw.replace("-", "/"))
    if vt == "time":
        raw = _attr(cell, "time-value") or ""
        m = _TIME_RE.fullmatch(raw)
        if m:
            return ("time", "%02d:%02d:%02d" % (
                int(m.group(1)), int(m.group(2)),
                int(float(m.group(3)))))
        return ("time", raw)
    texts = ["".join(p.itertext()) for p in cell if _strip(p.tag) == "p"]
    return ("string", "\n".join(texts) if texts else "")


def ods_layers(data: bytes, headers: str = "AUTO"
               ) -> dict[str, tuple[list[dict], list[tuple]]]:
    zf = zipfile.ZipFile(io.BytesIO(data))
    root = ET.fromstring(zf.read("content.xml"))
    out = {}
    for table in root.iter():
        if _strip(table.tag) != "table":
            continue
        name = _attr(table, "name")
        if name is None:
            continue
        rows: list[dict] = []
        for row in table:
            if _strip(row.tag) != "table-row":
                continue
            repeat = int(_attr(row, "number-rows-repeated") or "1")
            cells: dict[int, tuple] = {}
            col = 0
            for cell in row:
                if _strip(cell.tag) not in ("table-cell",
                                            "covered-table-cell"):
                    continue
                crep = int(_attr(cell, "number-columns-repeated") or "1")
                val = _cell_value(cell)
                if val is not None and not (
                        val[0] == "string" and val[1] == ""):
                    for c in range(col, col + crep):
                        cells[c] = val
                col += crep
            # huge repeats of an empty row are layout padding, not
            # data; small gaps ARE empty features (like XLSX row gaps)
            if not cells and repeat > 10000:
                repeat = 1
            for _ in range(min(repeat, 100000)):
                rows.append(dict(cells))
        # trailing empty rows are not features
        while rows and not rows[-1]:
            rows.pop()
        if not any(rows):
            continue
        out[name] = _rows_to_layer(rows, headers)
    return out


def read_ods(spark, path: str):
    with open(path, "rb") as fh:
        layers = ods_layers(fh.read())
    rows = []
    for name, (feats, fields) in layers.items():
        for f in feats:
            rows.append((name, {k: (str(v) if v is not None else None)
                                for k, v in f.items()}))
    return spark.createDataFrame(
        rows, "sheet string, fields map<string,string>")
