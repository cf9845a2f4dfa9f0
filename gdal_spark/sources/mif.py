"""MapInfo MIF/MID reader — ogr/ogrsf_frmts/mitab (mitab_feature_mif.cpp).

Header: Version / Charset / Delimiter / CoordSys / Columns block with
field name + MapInfo type. Data section objects supported:

  * Point x y                      -> POINT
  * Line x1 y1 x2 y2               -> LINESTRING
  * Pline [n] / Pline MULTIPLE k   -> LINESTRING / MULTILINESTRING
  * Region n (n rings)             -> POLYGON (holes by containment) or
                                      MULTIPOLYGON for disjoint rings
  * Rect x1 y1 x2 y2               -> POLYGON (the golden 5-point ring)
  * MultiPoint n                   -> MULTIPOINT
  * Collection n                   -> GEOMETRYCOLLECTION
  * NONE                           -> no geometry
  * RoundRect / Ellipse / Arc / Text: consumed (object-level skip with
    geometry None — the reference tessellates arcs; documented
    deviation), styling clauses (Pen/Brush/Symbol/Font/Smooth/Center/
    Spacing/Justify/Angle/Label) skipped.

MID rows follow the declared Delimiter with doubled-quote escaping
(mitab's "" convention); values are cast per the Columns types.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from gdal_spark.functions.geomops import _rebuild_wkt


_STYLE = (
    "pen", "brush", "symbol", "font", "smooth", "center", "spacing",
    "justify", "angle", "label",
)


def _parse_mid_line(line: str, delim: str) -> list[str]:
    out, cur, in_q, i = [], [], False, 0
    while i < len(line):
        c = line[i]
        if in_q:
            if c == '"':
                if i + 1 < len(line) and line[i + 1] == '"':
                    cur.append('"')
                    i += 1
                else:
                    in_q = False
            else:
                cur.append(c)
        elif c == '"':
            in_q = True
        elif c == delim:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(c)
        i += 1
    out.append("".join(cur))
    return out


def _ring_contains(outer: np.ndarray, pt) -> bool:
    x, y = pt
    inside = False
    for i in range(len(outer) - 1):
        xa, ya = outer[i]
        xb, yb = outer[i + 1]
        if (ya > y) != (yb > y):
            if x < xa + (y - ya) / (yb - ya) * (xb - xa):
                inside = not inside
    return inside


def _region_to_geom(rings: list[np.ndarray]):
    """mitab ring organization: outers with their contained holes."""
    closed = []
    for r in rings:
        if len(r) and (r[0] != r[-1]).any():
            r = np.vstack([r, r[0]])
        closed.append(r)
    if len(closed) == 1:
        return "POLYGON", closed
    outers: list[list[np.ndarray]] = []
    for r in closed:
        placed = False
        for poly in outers:
            if _ring_contains(poly[0], r[0]):
                poly.append(r)
                placed = True
                break
        if not placed:
            outers.append([r])
    if len(outers) == 1:
        return "POLYGON", outers[0]
    return "MULTIPOLYGON", outers


class _Lines:
    def __init__(self, text: str):
        self.lines = text.splitlines()
        self.i = 0

    def peek(self):
        while self.i < len(self.lines) and not self.lines[self.i].strip():
            self.i += 1
        return self.lines[self.i].strip() if self.i < len(self.lines) else None

    def next(self):
        ln = self.peek()
        self.i += 1
        return ln


def _read_points(it: _Lines, n: int) -> np.ndarray:
    pts = []
    for _ in range(n):
        vals = it.next().split()
        pts.append((float(vals[0]), float(vals[1])))
    return np.array(pts, float)


def _parse_object(it: _Lines):
    """One Data-section object -> (KIND, payload) or None geometry."""
    ln = it.next()
    tok = ln.split()
    kw = tok[0].upper()
    if kw == "POINT":
        return "POINT", (float(tok[1]), float(tok[2]))
    if kw == "LINE":
        return "LINESTRING", np.array(
            [(float(tok[1]), float(tok[2])), (float(tok[3]), float(tok[4]))]
        )
    if kw == "PLINE":
        if len(tok) > 1 and tok[1].upper() == "MULTIPLE":
            k = int(tok[2])
            parts = []
            for _ in range(k):
                n = int(it.next())
                parts.append(_read_points(it, n))
            return "MULTILINESTRING", parts
        n = int(tok[1]) if len(tok) > 1 else int(it.next())
        return "LINESTRING", _read_points(it, n)
    if kw == "REGION":
        k = int(tok[1])
        rings = []
        for _ in range(k):
            n = int(it.next())
            rings.append(_read_points(it, n))
        return _region_to_geom(rings)
    if kw == "RECT":
        x1, y1, x2, y2 = (float(v) for v in tok[1:5])
        ring = np.array([(x1, y1), (x2, y1), (x2, y2), (x1, y2), (x1, y1)])
        return "POLYGON", [ring]
    if kw == "MULTIPOINT":
        n = int(tok[1])
        return "MULTIPOINT", _read_points(it, n)
    if kw == "COLLECTION":
        k = int(tok[1])
        return "GEOMETRYCOLLECTION", [_parse_object(it) for _ in range(k)]
    if kw == "NONE":
        return None
    if kw in ("ROUNDRECT", "ELLIPSE"):
        # bbox on the object line (+ radius for roundrect); skip
        return None
    if kw == "ARC":
        # bbox line, then possibly a separate angles line
        nxt = it.peek()
        if nxt and len(tok) < 7 and re.match(r"^[-\d.]", nxt):
            it.next()
        return None
    if kw == "TEXT":
        if len(tok) == 1 or tok[1].startswith('"'):
            if len(tok) == 1:
                it.next()  # the quoted string line
            it.next()  # the bbox line
        return None
    raise ValueError(f"unsupported MIF object {kw}")


def parse_mif(mif_text: str, mid_text: str | None = None) -> list[dict]:
    """-> [{wkt, fields...}] in object order."""
    it = _Lines(mif_text)
    delim = ","
    columns: list[tuple[str, str]] = []
    while True:
        ln = it.peek()
        if ln is None:
            return []
        up = ln.upper()
        if up.startswith("DELIMITER"):
            m = re.search(r'"(.)"', ln)
            if m:
                delim = m.group(1)
            it.next()
        elif up.startswith("COLUMNS"):
            n = int(ln.split()[1])
            it.next()
            for _ in range(n):
                parts = it.next().split()
                columns.append((parts[0], parts[1].rstrip("(").upper()))
        elif up == "DATA":
            it.next()
            break
        else:
            it.next()

    feats = []
    while True:
        ln = it.peek()
        if ln is None:
            break
        first = ln.split()[0].lower()
        if any(first.startswith(s) for s in _STYLE):
            it.next()
            continue
        geom = _parse_object(it)
        if geom is None:
            feats.append({"wkt": None})
        else:
            kind, payload = geom
            if kind == "GEOMETRYCOLLECTION":
                payload = [g for g in payload if g is not None]
            feats.append({"wkt": _rebuild_wkt(kind, payload)})

    if mid_text is not None:
        rows = [r for r in mid_text.splitlines() if r.strip() != ""]
        for feat, row in zip(feats, rows):
            vals = _parse_mid_line(row, delim)
            for (name, typ), v in zip(columns, vals):
                if typ.startswith("INTEGER") or typ.startswith("SMALLINT"):
                    feat[name] = int(v) if v.strip() else None
                elif typ.startswith("FLOAT") or typ.startswith("DECIMAL"):
                    feat[name] = float(v) if v.strip() else None
                else:
                    feat[name] = v
    return feats


def read_mif(spark, files: list[str]):
    """MIF(+MID) files -> (path, fid, wkt, fields) DataFrame."""
    import os

    from pyspark.sql import types as T

    sch = T.StructType(
        [
            T.StructField("path", T.StringType()),
            T.StructField("fid", T.LongType()),
            T.StructField("wkt", T.StringType()),
            T.StructField("fields", T.MapType(T.StringType(), T.StringType())),
        ]
    )
    fdf = spark.createDataFrame([(p,) for p in files], "path: string")

    def run(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                mif = open(r.path).read()
                mid_path = os.path.splitext(r.path)[0] + ".mid"
                mid = open(mid_path).read() if os.path.exists(mid_path) else None
                for i, f in enumerate(parse_mif(mif, mid)):
                    rows.append(
                        (
                            r.path, i, f["wkt"],
                            {
                                k: str(v)
                                for k, v in f.items()
                                if k != "wkt" and v is not None
                            },
                        )
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in sch.fields])

    return fdf.mapInPandas(run, sch)
