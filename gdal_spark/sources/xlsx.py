"""XLSX spreadsheet driver (ogr/ogrsf_frmts/xlsx — re-derived).

Facts transcribed:
  - workbook: xl/workbook.xml sheet names in order, rIds resolved
    through xl/_rels/workbook.xml.rels to worksheet parts
  - strings: xl/sharedStrings.xml <si> entries (all <t> descendants)
  - styles: xl/styles.xml cellXfs/xf numFmtId -> field type: builtin
    14-17 Date, 18-21 Time, 22 DateTime; custom >= 164 classified by
    the formatCode's DD/YY (date) and HH (time) markers  (:1800-1870)
  - cells: r="A1" addresses, t = s|str|inlineStr|b|n(default), s =
    style index; date/time values are 1899-12-30-epoch serials
    rendered as YYYY/MM/DD, HH:MM:SS and YYYY/MM/DD HH:MM:SS
  - header detection: first row all-strings + second row not
    all-strings and non-empty (DetectHeaderLine :764-813);
    HEADERS=FORCE|DISABLE override
  - column types merge across rows (Integer -> Real -> String;
    date-kind mixes -> DateTime)
"""

from __future__ import annotations

import datetime
import io
import re
import xml.etree.ElementTree as ET
import zipfile

__all__ = ["xlsx_layers", "read_xlsx"]

_EPOCH = datetime.datetime(1899, 12, 30)


def _strip(tag):
    return tag.rsplit("}", 1)[-1]


def _col_index(ref: str) -> int:
    n = 0
    for ch in ref:
        if ch.isalpha():
            n = n * 26 + (ord(ch.upper()) - 64)
        else:
            break
    return n - 1


def _styles(zf: zipfile.ZipFile) -> list[str]:
    try:
        xml = zf.read("xl/styles.xml")
    except KeyError:
        return []
    root = ET.fromstring(xml)
    custom: dict[int, str] = {}
    for el in root.iter():
        if _strip(el.tag) == "numFmt":
            code = el.get("formatCode", "")
            fid = int(el.get("numFmtId", "-1"))
            if fid >= 164:
                has_date = any(m in code for m in ("DD", "dd", "YY", "yy"))
                has_time = "HH" in code or "hh" in code
                if has_date and has_time:
                    custom[fid] = "datetime_ms" if (
                        "SS.000" in code or "ss.000" in code) else "datetime"
                elif has_date:
                    custom[fid] = "date"
                elif has_time:
                    custom[fid] = "time"
                else:
                    custom[fid] = "float"
    styles: list[str] = []
    in_cellxfs = False
    for el in root.iter():
        t = _strip(el.tag)
        if t == "cellXfs":
            in_cellxfs = True
            for xf in el:
                if _strip(xf.tag) != "xf":
                    continue
                fid = int(xf.get("numFmtId", "-1"))
                if 14 <= fid <= 17:
                    styles.append("date")
                elif 18 <= fid <= 21:
                    styles.append("time")
                elif fid == 22:
                    styles.append("datetime")
                elif fid >= 164:
                    styles.append(custom.get(fid, "float"))
                else:
                    styles.append("float")
    return styles


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        xml = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    root = ET.fromstring(xml)
    out = []
    for si in root:
        if _strip(si.tag) != "si":
            continue
        parts = [el.text or "" for el in si.iter() if _strip(el.tag) == "t"]
        out.append("".join(parts))
    return out


def _serial_to_dt(v: float) -> datetime.datetime:
    return _EPOCH + datetime.timedelta(days=v)


def _render(value, kind):
    if isinstance(value, str):  # already rendered (ODS date/time strings)
        return value
    if kind == "date":
        return _serial_to_dt(value).strftime("%Y/%m/%d")
    if kind == "time":
        secs = round(value * 86400)
        return "%02d:%02d:%02d" % (secs // 3600, secs % 3600 // 60,
                                   secs % 60)
    if kind in ("datetime", "datetime_ms"):
        dt = _serial_to_dt(round(value * 86400) / 86400.0)
        return dt.strftime("%Y/%m/%d %H:%M:%S")
    return value


_TYPE_RANK = {"integer": 0, "float": 1, "string": 2}


def _merge_type(a: str | None, b: str) -> str:
    if a is None or a == b:
        return b
    date_kinds = {"date", "time", "datetime", "datetime_ms"}
    if a in date_kinds and b in date_kinds:
        return "datetime"
    if a in _TYPE_RANK and b in _TYPE_RANK:
        return ("integer", "float", "string")[max(_TYPE_RANK[a],
                                                  _TYPE_RANK[b])]
    return "string"


def _parse_sheet(xml: bytes, shared: list[str], styles: list[str]):
    root = ET.fromstring(xml)
    rows = []
    last_r = 0
    for el in root.iter():
        if _strip(el.tag) != "row":
            continue
        r_attr = el.get("r")
        if r_attr is not None:
            r_no = int(r_attr)
            # skipped row numbers materialize as empty features
            for _ in range(last_r + 1, r_no):
                rows.append({})
            last_r = r_no
        else:
            last_r += 1
        cells: dict[int, tuple] = {}
        for c in el:
            if _strip(c.tag) != "c":
                continue
            ref = c.get("r", "")
            idx = _col_index(ref) if ref else len(cells)
            t = c.get("t", "n")
            s = c.get("s")
            v_el = None
            inline = None
            for sub in c:
                st = _strip(sub.tag)
                if st == "v":
                    v_el = sub
                elif st == "is":
                    inline = "".join(e.text or "" for e in sub.iter()
                                     if _strip(e.tag) == "t")
            if t == "s" and v_el is not None:
                cells[idx] = ("string", shared[int(v_el.text)])
            elif t in ("str",):
                cells[idx] = ("string", v_el.text if v_el is not None
                              else "")
            elif t == "inlineStr":
                cells[idx] = ("string", inline or "")
            elif t == "b" and v_el is not None:
                cells[idx] = ("integer", int(v_el.text))
            elif v_el is not None and v_el.text is not None:
                txt = v_el.text.strip()
                kind = "float"
                if s is not None and styles:
                    si = int(s)
                    if 0 <= si < len(styles):
                        kind = styles[si]
                if kind == "float":
                    if re.fullmatch(r"[+-]?\d+", txt):
                        kind = "integer"
                        val = int(txt)
                    else:
                        val = float(txt)
                else:
                    val = float(txt)
                cells[idx] = (kind, val)
        rows.append(cells)
    return rows


def _rows_to_layer(rows, headers: str = "AUTO"):
    # drop leading fully-empty rows
    while rows and not rows[0]:
        rows.pop(0)
    if not rows:
        return [], []
    first = rows[0]
    ncols_first = (max(first) + 1) if first else 0
    first_all_str = all(first.get(i, ("", None))[0] == "string"
                        for i in first)
    second = rows[1] if len(rows) > 1 else {}
    n_text = sum(1 for v in second.values() if v[0] == "string")
    n_nonempty = sum(1 for v in second.values())
    use_headers = False
    if headers == "FORCE":
        use_headers = True
    elif headers == "DISABLE":
        use_headers = False
    elif first and first_all_str and \
            ncols_first >= ((max(second) + 1) if second else 0) and \
            n_text != len(first) and n_nonempty != 0:
        use_headers = True

    if use_headers:
        names = [str(first.get(i, ("", "Field%d" % (i + 1)))[1])
                 for i in range(ncols_first)]
        data = rows[1:]
    else:
        names = ["Field%d" % (i + 1) for i in range(ncols_first)]
        data = rows
    ncols = max([ncols_first] + [(max(r) + 1) for r in data if r])
    while len(names) < ncols:
        names.append("Field%d" % (len(names) + 1))

    types: list[str | None] = [None] * ncols
    feats = []
    for r in data:
        feat = {}
        for i in range(ncols):
            if i in r:
                kind, val = r[i]
                types[i] = _merge_type(types[i], kind)
                feat[names[i]] = _render(val, kind)
            else:
                feat[names[i]] = None
        feats.append(feat)
    ogr_types = []
    for t in types:
        ogr_types.append({
            None: "string", "integer": "integer", "float": "real",
            "string": "string", "date": "date", "time": "time",
            "datetime": "datetime", "datetime_ms": "datetime",
        }[t])
    return feats, list(zip(names, ogr_types))


def xlsx_layers(data: bytes, headers: str = "AUTO"
                ) -> dict[str, tuple[list[dict], list[tuple]]]:
    """-> {sheet name: (features, [(field, type)])}."""
    zf = zipfile.ZipFile(io.BytesIO(data))
    shared = _shared_strings(zf)
    styles = _styles(zf)

    rels = {}
    try:
        rroot = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
        for rel in rroot:
            rels[rel.get("Id")] = rel.get("Target")
    except KeyError:
        pass
    out = {}
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    for el in wb.iter():
        if _strip(el.tag) != "sheet":
            continue
        name = el.get("name")
        rid = None
        for k, v in el.attrib.items():
            if _strip(k) == "id":
                rid = v
        target = rels.get(rid, "worksheets/sheet1.xml")
        if not target.startswith("/"):
            target = "xl/" + target
        else:
            target = target.lstrip("/")
        rows = _parse_sheet(zf.read(target), shared, styles)
        if not any(rows):  # sheets with no cells are skipped
            continue
        out[name] = _rows_to_layer(rows, headers)
    return out


def read_xlsx(spark, path: str):
    with open(path, "rb") as fh:
        layers = xlsx_layers(fh.read())
    rows = []
    for name, (feats, fields) in layers.items():
        for f in feats:
            rows.append((name, {k: (str(v) if v is not None else None)
                                for k, v in f.items()}))
    return spark.createDataFrame(
        rows, "sheet string, fields map<string,string>")
