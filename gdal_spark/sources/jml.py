"""OpenJUMP JML driver (ogr/ogrsf_frmts/jml/).

Reference semantics (re-derived):
  - JCSGMLInputTemplate declares the collection/feature/geometry element
    names and the column mapping: each <column> matches a descendant
    element by name (plus an optional attribute name/value pair) and
    reads its value from the body or a named attribute. Columns outside
    ColumnDefinitions but still inside the template count; anything
    outside the template is ignored.
  - <feature> elements anywhere BELOW the collection element are
    features (arbitrary nesting); <feature>/<geometry> elements outside
    that scope are ignored
  - the geometry element wraps GML2 (delegated to the engine's codec)
  - column type DATE is OGR DateTime; "YYYY/MM/DD" gets a midnight
    time, ISO "...T..sss+0200" normalizes to "+02"
  - an R_G_B column doubles as the feature style: BRUSH(fc:#...) for
    polygons, PEN(c:#...) otherwise
  - the writer's exact output layout is pinned by the reference
    autotest golden (ogr_jml.py test_ogr_jml_2a)
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

__all__ = ["jml_features", "jml_write", "read_jml"]

_ISO_DT = re.compile(
    r"(\d{4})-(\d{2})-(\d{2})T(\d{2}):(\d{2}):(\d{2})"
    r"(?:\.\d+)?([+-]\d{2}):?(\d{2})?")


def _strip(tag) -> str:
    return tag.rsplit("}", 1)[-1] if isinstance(tag, str) else ""


def _norm_date(v: str) -> str:
    v = v.strip()
    m = _ISO_DT.match(v)
    if m:
        y, mo, d, hh, mi, ss, tzh, tzm = m.groups()
        tz = tzh if not tzm or tzm == "00" else f"{tzh}:{tzm}"
        return f"{y}/{mo}/{d} {hh}:{mi}:{ss}{tz}"
    if re.fullmatch(r"\d{4}/\d{2}/\d{2}", v):
        return v + " 00:00:00"
    if re.fullmatch(r"\d{4}-\d{2}-\d{2}", v):
        return v.replace("-", "/") + " 00:00:00"
    return v


def _template_of(root):
    tmpl = None
    for el in root.iter():
        if _strip(el.tag) == "JCSGMLInputTemplate":
            tmpl = el
            break
    names = {"collection": "featureCollection", "feature": "feature",
             "geometry": "geometry"}
    columns = []
    if tmpl is not None:
        for el in tmpl.iter():
            t = _strip(el.tag)
            if t == "CollectionElement" and el.text:
                names["collection"] = el.text.strip()
            elif t == "FeatureElement" and el.text:
                names["feature"] = el.text.strip()
            elif t == "GeometryElement" and el.text:
                names["geometry"] = el.text.strip()
            elif t == "column":
                col = {"name": None, "type": "STRING", "element": None,
                       "attr_name": None, "attr_value": None,
                       "loc": "body", "loc_attr": None}
                for sub in el:
                    st = _strip(sub.tag)
                    if st == "name":
                        col["name"] = (sub.text or "").strip()
                    elif st == "type":
                        col["type"] = (sub.text or "").strip().upper()
                    elif st == "valueElement":
                        col["element"] = sub.get("elementName")
                        col["attr_name"] = sub.get("attributeName")
                        col["attr_value"] = sub.get("attributeValue")
                    elif st == "valueLocation":
                        col["loc"] = sub.get("position", "body")
                        col["loc_attr"] = sub.get("attributeName")
                if col["name"] and col["element"]:
                    columns.append(col)
    return names, columns


def _cast(col, v: str | None):
    if v is None or v == "":
        return None
    t = col["type"]
    if t == "INTEGER":
        try:
            return int(v)
        except ValueError:
            return None
    if t == "DOUBLE":
        try:
            return float(v)
        except ValueError:
            return None
    if t == "DATE":
        return _norm_date(v)
    return v


def jml_features(data: bytes | str) -> tuple[list[dict], list[dict]]:
    """-> (features, columns). Each feature dict has column values plus
    'wkt' and 'style'."""
    text = data.decode("utf-8", "replace") if isinstance(data, bytes) \
        else data
    root = ET.fromstring(text)
    names, columns = _template_of(root)

    from gdal_spark.sources.gml import gml_to_wkt

    feats = []

    def scan_features(el, in_collection: bool):
        tag = _strip(el.tag)
        if in_collection and tag == names["feature"]:
            feats.append(_read_feature(el))
            return  # features don't nest
        for child in el:
            scan_features(child,
                          in_collection or tag == names["collection"])

    def _read_feature(fel) -> dict:
        feat: dict = {"wkt": None, "style": None}
        geom_el = None
        for el in fel.iter():
            if el is fel:
                continue
            if _strip(el.tag) == names["geometry"] and geom_el is None:
                geom_el = el
        if geom_el is not None:
            for child in geom_el:
                try:
                    feat["wkt"] = gml_to_wkt(
                        ET.tostring(child, encoding="unicode"))
                    break
                except Exception:
                    continue
        for col in columns:
            val = None
            for el in fel.iter():
                if el is fel or _strip(el.tag) != col["element"]:
                    continue
                if col["attr_name"] and \
                        el.get(col["attr_name"]) != col["attr_value"]:
                    continue
                if col["loc"] == "attribute":
                    val = el.get(col["loc_attr"] or col["attr_name"])
                else:
                    val = el.text if el.text is not None else ""
                break
            feat[col["name"]] = _cast(col, val)
        rgb = feat.get("R_G_B")
        if rgb and feat["wkt"]:
            feat["style"] = ("BRUSH(fc:#%s)" if "POLYGON" in feat["wkt"]
                             else "PEN(c:#%s)") % rgb
        return feat

    scan_features(root, False)
    return feats, columns


# ---------------------------------------------------------------------------
# writer (layout pinned by autotest ogr_jml.py test_ogr_jml_2a)
# ---------------------------------------------------------------------------

_COLUMN_TMPL = """     <column>
          <name>%s</name>
          <type>%s</type>
          <valueElement elementName="property" attributeName="name" attributeValue="%s"/>
          <valueLocation position="body"/>
     </column>
"""


def _esc(v: str) -> str:
    return (str(v).replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;"))


def _gml2_of(wkt: str | None) -> str:
    if not wkt:
        return "<gml:MultiGeometry></gml:MultiGeometry>"
    from gdal_spark.functions.geomops import parse_wkt_any
    kind, payload = parse_wkt_any(wkt)

    def coords(pts):
        import numpy as np
        a = np.asarray(pts, dtype=float)
        if a.ndim == 1:
            return ",".join("%.10g" % c for c in a)
        return " ".join(",".join("%.10g" % c for c in p) for p in a)

    if kind == "POINT":
        return "<gml:Point><gml:coordinates>%s</gml:coordinates>" \
               "</gml:Point>" % coords(payload)
    if kind == "LINESTRING":
        return "<gml:LineString><gml:coordinates>%s</gml:coordinates>" \
               "</gml:LineString>" % coords(payload)
    if kind == "POLYGON":
        parts = ["<gml:outerBoundaryIs><gml:LinearRing><gml:coordinates>"
                 "%s</gml:coordinates></gml:LinearRing>"
                 "</gml:outerBoundaryIs>" % coords(payload[0])]
        for hole in payload[1:]:
            parts.append("<gml:innerBoundaryIs><gml:LinearRing>"
                         "<gml:coordinates>%s</gml:coordinates>"
                         "</gml:LinearRing></gml:innerBoundaryIs>"
                         % coords(hole))
        return "<gml:Polygon>%s</gml:Polygon>" % "".join(parts)
    raise ValueError(f"JML writer unsupported geometry {kind}")


def jml_write(feats: list[dict], fields: list[tuple[str, str]],
              srs_epsg: int | None = None) -> str:
    """fields: [(name, ogr_type)] with ogr_type in
    string/integer/real/date/datetime/time."""
    type_map = {"string": "STRING", "integer": "INTEGER",
                "real": "DOUBLE", "date": "DATE", "datetime": "DATE",
                "time": "STRING"}
    out = ["<?xml version='1.0' encoding='UTF-8'?>\n"
           "<JCSDataFile xmlns:gml=\"http://www.opengis.net/gml\" "
           "xmlns:xsi=\"http://www.w3.org/2000/10/XMLSchema-instance\" >\n"
           "<JCSGMLInputTemplate>\n"
           "<CollectionElement>featureCollection</CollectionElement>\n"
           "<FeatureElement>feature</FeatureElement>\n"
           "<GeometryElement>geometry</GeometryElement>\n"
           "<CRSElement>boundedBy</CRSElement>\n"
           "<ColumnDefinitions>\n"]
    all_fields = list(fields) + [("R_G_B", "string")]
    for name, t in all_fields:
        out.append(_COLUMN_TMPL % (name, type_map.get(t, "STRING"), name))
    out.append("</ColumnDefinitions>\n</JCSGMLInputTemplate>\n"
               "<featureCollection>\n")

    # bbox with the reference's reserved-width coordinates buffer
    xs: list[float] = []
    ys: list[float] = []
    for f in feats:
        wkt = f.get("wkt")
        if wkt and "EMPTY" not in wkt:
            for pair in re.findall(r"-?[\d.]+ -?[\d.]+", wkt):
                x, y = pair.split()
                xs.append(float(x))
                ys.append(float(y))
    srs = ("http://www.opengis.net/gml/srs/epsg.xml#%d" % srs_epsg) \
        if srs_epsg else ""
    coords_txt = "%.10f,%.10f %.10f,%.10f" % (
        min(xs) if xs else 0, min(ys) if ys else 0,
        max(xs) if xs else 0, max(ys) if ys else 0)
    out.append("  <gml:boundedBy>\n"
               "    <gml:Box srsName=\"%s\">\n"
               "      <gml:coordinates decimal=\".\" cs=\",\" ts=\" \">"
               "%s</gml:coordinates>\n"
               "    </gml:Box>\n"
               "  </gml:boundedBy>\n"
               % (srs, coords_txt.ljust(100)))

    for f in feats:
        out.append("     <feature>\n          <geometry>\n"
                   "                %s\n          </geometry>\n"
                   % _gml2_of(f.get("wkt")))
        style = f.get("style") or ""
        m = re.search(r"#([0-9A-Fa-f]{6})", style)
        rgb = m.group(1) if m else None
        for name, t in fields:
            v = f.get(name)
            if v is None:
                body = ""
            elif t == "date":
                body = str(v).replace("-", "/")[:10]
            elif t == "datetime":
                s = str(v)
                m2 = re.fullmatch(
                    r"(\d{4})[-/](\d{2})[-/](\d{2})[ T]"
                    r"(\d{2}:\d{2}:\d{2})(?:([+-]\d{2}):?(\d{2})?)?", s)
                if m2:
                    y, mo, d, hms, tzh, tzm = m2.groups()
                    if tzh:
                        body = "%s-%s-%sT%s.000%s%s" % (
                            y, mo, d, hms, tzh, tzm or "00")
                    else:
                        body = f"{y}-{mo}-{d}T{hms}"
                else:
                    body = _esc(s)
            else:
                body = _esc(v)
            out.append('          <property name="%s">%s</property>\n'
                       % (name, body))
        out.append('          <property name="R_G_B">%s</property>\n'
                   % (rgb or ""))
        out.append("     </feature>\n")
    out.append("</featureCollection>\n</JCSDataFile>\n")
    return "".join(out)


def read_jml(spark, path: str):
    with open(path, "rb") as fh:
        feats, _ = jml_features(fh.read())
    rows = [(f.get("wkt"), f.get("style"),
             {k: str(v) for k, v in f.items()
              if k not in ("wkt", "style") and v is not None})
            for f in feats]
    return spark.createDataFrame(
        rows, "wkt string, style string, fields map<string,string>")
