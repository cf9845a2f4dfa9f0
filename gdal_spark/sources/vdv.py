"""VDV-452 / IDF driver (ogr/ogrsf_frmts/vdv/).

Reference semantics (re-derived):

  IDF (Intermodal Data Format):
    "chs;" charset header, "eoh;" end-of-header, then table blocks
    "tbl;Name / atr;cols / frm;types / num;n / rec;... / end;n".
    Types: decimal(n) -> int, decimal(n,m) -> double, string(n) -> str.
    Geometry model: Node(X,Y[,Z]) points; Link linestrings assembled as
    FROM_NODE point + LinkCoordinate points ordered by COUNT + TO_NODE
    point; LinkCoordinate points; other tables attribute-only.

  VDV-452: "key; values" lines with quoted strings ("" escaping), a
    mod/src/chs/ver/ifv/dve/fft header, per-table tbl/atr/frm/rec/end
    blocks and a trailing "eof; <table count>". Field formats char[w],
    num[w.0] (width-1 for explicit widths, 10/19 defaults), boolean.
    The writer layout is pinned by the autotest golden
    (ogr_vdv.py test_ogr_vdv_2).
"""

from __future__ import annotations

import re

__all__ = ["idf_layers", "vdv_parse", "vdv_write", "read_idf"]


def _fmt(v: float) -> str:
    return "%.15g" % v


# ---------------------------------------------------------------------------
# IDF
# ---------------------------------------------------------------------------

def _idf_cast(v: str, typ: str):
    if typ.startswith("decimal"):
        if "," in typ:
            return float(v)
        return int(v)
    return v.strip('"')


def idf_layers(data: bytes | str) -> dict[str, list[dict]]:
    text = data.decode("latin-1") if isinstance(data, bytes) else data
    tables: dict[str, dict] = {}
    order: list[str] = []
    cur = None
    for line in text.splitlines():
        if not line.strip():
            continue
        key, _, rest = line.partition(";")
        key = key.strip()
        if key == "tbl":
            cur = {"name": rest.strip(), "atr": [], "frm": [], "rows": []}
            tables[cur["name"]] = cur
            order.append(cur["name"])
        elif cur is None:
            continue
        elif key == "atr":
            cur["atr"] = [c.strip() for c in rest.split(";")]
        elif key == "frm":
            cur["frm"] = [c.strip() for c in rest.split(";")]
        elif key == "rec":
            vals = rest.split(";")
            row = {}
            for i, name in enumerate(cur["atr"]):
                if i < len(vals):
                    typ = cur["frm"][i] if i < len(cur["frm"]) else "string"
                    row[name] = _idf_cast(vals[i].strip(), typ)
            cur["rows"].append(row)

    def node_pt(row):
        pt = [row["X"], row["Y"]]
        if "Z" in row:
            pt.append(row["Z"])
        return tuple(float(c) for c in pt)

    def pt_wkt(pt):
        tag = "POINT (" if len(pt) == 2 else "POINT ("
        return tag + " ".join(_fmt(c) for c in pt) + ")"

    layers: dict[str, list[dict]] = {}
    nodes = {}
    if "Node" in tables:
        feats = []
        for row in tables["Node"]["rows"]:
            pt = node_pt(row)
            nodes[row["NODE_ID"]] = pt
            feats.append(dict(row, wkt=pt_wkt(pt)))
        layers["Node"] = feats
    coords_by_link: dict = {}
    if "LinkCoordinate" in tables:
        feats = []
        for row in tables["LinkCoordinate"]["rows"]:
            pt = node_pt(row)
            coords_by_link.setdefault(row["LINK_ID"], []).append(
                (row.get("COUNT", 0), pt))
            feats.append(dict(row, wkt=pt_wkt(pt)))
        layers["LinkCoordinate"] = feats
    if "Link" in tables:
        feats = []
        for row in tables["Link"]["rows"]:
            pts = []
            frm = nodes.get(row.get("FROM_NODE"))
            if frm:
                pts.append(frm)
            for _, pt in sorted(coords_by_link.get(row["LINK_ID"], [])):
                pts.append(pt)
            to = nodes.get(row.get("TO_NODE"))
            if to:
                pts.append(to)
            wkt = "LINESTRING (%s)" % ",".join(
                " ".join(_fmt(c) for c in p) for p in pts) \
                if len(pts) >= 2 else None
            feats.append(dict(row, wkt=wkt))
        layers["Link"] = feats
    for name in order:
        if name not in ("Node", "Link", "LinkCoordinate"):
            layers[name] = [dict(r, wkt=None) for r in tables[name]["rows"]]
    # keep IDF file order (Node, Link, LinkCoordinate first per the model)
    ordered = {}
    for name in order:
        ordered[name] = layers[name]
    return ordered


# ---------------------------------------------------------------------------
# VDV-452
# ---------------------------------------------------------------------------

def _vdv_split(rest: str) -> list[str | None]:
    out: list[str | None] = []
    cur: list[str] = []
    in_q = False
    was_quoted = False
    i = 0
    while i < len(rest):
        ch = rest[i]
        if ch == '"':
            if in_q and i + 1 < len(rest) and rest[i + 1] == '"':
                cur.append('"')
                i += 2
                continue
            in_q = not in_q
            was_quoted = True
        elif ch == ";" and not in_q:
            v = "".join(cur).strip() if not was_quoted else "".join(cur)
            out.append(None if (v == "NULL" and not was_quoted) else v)
            cur = []
            was_quoted = False
        elif in_q or ch != " " or cur:
            if in_q:
                cur.append(ch)
            else:
                cur.append(ch)
        i += 1
    v = "".join(cur).strip() if not was_quoted else "".join(cur)
    if v or was_quoted:
        out.append(None if (v == "NULL" and not was_quoted) else v)
    return out


def vdv_parse(data: bytes | str) -> tuple[dict[str, dict], dict]:
    """-> ({table: {'atr': [...], 'frm': [...], 'rows': [...]}}, header)."""
    text = data.decode("latin-1") if isinstance(data, bytes) else data
    tables: dict[str, dict] = {}
    header: dict = {}
    cur = None
    for line in text.splitlines():
        if not line.strip():
            continue
        key, _, rest = line.partition(";")
        key = key.strip()
        if key == "tbl":
            cur = {"atr": [], "frm": [], "rows": []}
            tables[rest.strip()] = cur
        elif key == "atr" and cur is not None:
            cur["atr"] = [c.strip() for c in rest.split(";") if c.strip()]
        elif key == "frm" and cur is not None:
            cur["frm"] = [c.strip() for c in rest.split(";") if c.strip()]
        elif key == "rec" and cur is not None:
            vals = _vdv_split(rest.lstrip())
            row = {}
            for i, name in enumerate(cur["atr"]):
                v = vals[i] if i < len(vals) else None
                if v is not None and i < len(cur["frm"]) and \
                        cur["frm"][i].startswith(("num", "boolean")):
                    try:
                        row[name] = int(v)
                    except ValueError:
                        row[name] = None
                else:
                    row[name] = v
            cur["rows"].append(row)
        elif key in ("end", "eof"):
            if key == "eof":
                cur = None
        elif cur is None and key not in ("mod",):
            vals = _vdv_split(rest.lstrip())
            header[key] = vals[0] if vals else None
    return tables, header


def _vdv_frm(t: str, width: int = 0) -> str:
    if t == "string":
        return "char[%d]" % (width if width else 80)
    if t == "boolean":
        return "boolean"
    if t == "integer64":
        return "num[%d.0]" % ((width - 1) if width else 19)
    return "num[%d.0]" % ((width - 1) if width else 10)


def vdv_write(layers: dict[str, dict],
              src_date: str = "01.01.1970", src_time: str = "00.00.00",
              extra_header: dict | None = None) -> str:
    """layers: {name: {'fields': [(name, type, width)], 'rows': [dict]}}.
    Layout pinned by the reference autotest golden."""
    out = ["mod; DD.MM.YYYY; HH:MM:SS; free\n",
           'src; "UNKNOWN"; "%s"; "%s"\n' % (src_date, src_time),
           'chs; "ISO8859-1"\n', 'ver; "1.4"\n', 'ifv; "1.4"\n',
           'dve; "1.4"\n', 'fft; ""\n']
    for k, v in (extra_header or {}).items():
        out.append('%s; "%s"\n' % (k, v))
    for name, spec in layers.items():
        fields = spec.get("fields", [])
        out.append("tbl; %s\n" % name)
        if fields:
            out.append("atr; " + "; ".join(f[0] for f in fields) + "\n")
            out.append("frm; " + "; ".join(
                _vdv_frm(f[1], f[2] if len(f) > 2 else 0)
                for f in fields) + "\n")
        else:
            out.append("atr;\nfrm;\n")
        n = 0
        for row in spec.get("rows", []):
            vals = []
            for f in fields:
                v = row.get(f[0])
                if v is None:
                    vals.append("NULL")
                elif f[1] == "string":
                    vals.append('"%s"' % str(v).replace('"', '""'))
                else:
                    vals.append(str(int(v)))
            out.append("rec; " + "; ".join(vals) + "\n")
            n += 1
        out.append("end; %d\n" % n)
    out.append("eof; %d\n" % len(layers))
    return "".join(out)


def read_idf(spark, path: str):
    with open(path, "rb") as fh:
        layers = idf_layers(fh.read())
    rows = []
    for name, feats in layers.items():
        for f in feats:
            rows.append((name, f.get("wkt"),
                         {k: str(v) for k, v in f.items()
                          if k != "wkt" and v is not None}))
    return spark.createDataFrame(
        rows, "layer string, wkt string, fields map<string,string>")
