"""MapML driver (ogr/ogrsf_frmts/mapml — re-derived).

Facts: an xhtml-namespace <mapml-> document; map-body > map-extent
(bbox map-inputs) + map-feature elements (id = <class>.<fid>,
class = layer name); map-properties carries an HTML table whose
<td itemprop="NAME"> cells are the fields; map-geometry wraps
map-point / map-linestring / map-polygon (one map-coordinates per
ring) / map-multipoint / map-multilinestring / map-multipolygon /
map-geometrycollection with space-separated lon-lat pairs.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

__all__ = ["mapml_read", "mapml_write"]


def _strip(tag):
    return tag.rsplit("}", 1)[-1]


def _fmt(v: float) -> str:
    return "%.8f" % v if v != int(v) else "%.8f" % v


def _pairs(text: str):
    vals = [float(t) for t in (text or "").split()]
    return [(vals[i], vals[i + 1]) for i in range(0, len(vals) - 1, 2)]


def _coords_text(el) -> list:
    return [_pairs(c.text) for c in el.iter()
            if _strip(c.tag) == "map-coordinates"]


def _geom_wkt(el) -> str | None:
    t = _strip(el.tag)

    def fmt_pts(pts):
        return ",".join("%.10g %.10g" % p for p in pts)

    if t == "map-point":
        pts = _coords_text(el)
        return "POINT (%s)" % fmt_pts(pts[0]) if pts else None
    if t == "map-linestring":
        pts = _coords_text(el)
        return "LINESTRING (%s)" % fmt_pts(pts[0]) if pts else None
    if t == "map-polygon":
        rings = _coords_text(el)
        return "POLYGON (%s)" % ",".join(
            "(%s)" % fmt_pts(r) for r in rings) if rings else None
    if t == "map-multipoint":
        pts = _coords_text(el)
        return "MULTIPOINT (%s)" % fmt_pts(pts[0]) if pts else None
    if t == "map-multilinestring":
        parts = _coords_text(el)
        return "MULTILINESTRING (%s)" % ",".join(
            "(%s)" % fmt_pts(p) for p in parts) if parts else None
    if t == "map-multipolygon":
        polys = [w for w in (_geom_wkt(sub) for sub in el
                             if _strip(sub.tag) == "map-polygon") if w]
        return "MULTIPOLYGON (%s)" % ",".join(
            w[len("POLYGON "):] for w in polys) if polys else None
    if t == "map-geometrycollection":
        subs = [w for w in (_geom_wkt(sub) for sub in el) if w]
        return "GEOMETRYCOLLECTION (%s)" % ",".join(subs) if subs else None
    return None


def mapml_read(data: bytes | str) -> dict[str, list[dict]]:
    text = data.decode("utf-8", "replace") if isinstance(data, bytes) \
        else data
    root = ET.fromstring(text)
    layers: dict[str, list[dict]] = {}
    for feat_el in root.iter():
        if _strip(feat_el.tag) != "map-feature":
            continue
        cls = feat_el.get("class") or "features"
        fid = None
        fid_attr = feat_el.get("id")
        if fid_attr and "." in fid_attr:
            try:
                fid = int(fid_attr.rsplit(".", 1)[1])
            except ValueError:
                pass
        feat: dict = {"fid": fid, "wkt": None}
        for el in feat_el.iter():
            t = _strip(el.tag)
            if t == "td" and el.get("itemprop"):
                feat[el.get("itemprop")] = "".join(el.itertext()).strip()
            elif t == "map-geometry":
                for sub in el:
                    wkt = _geom_wkt(sub)
                    if wkt:
                        feat["wkt"] = wkt
                        break
        layers.setdefault(cls, []).append(feat)
    return layers


def _wkt_geom_el(wkt: str) -> str:
    """WKT -> map-* geometry markup (lon-lat pairs, reference layout)."""
    head = wkt.split("(", 1)[0].strip().upper()

    def coords_of(body):
        return " ".join("%.10g %.10g" % tuple(
            float(t) for t in pair.split()[:2])
            for pair in body.split(","))

    inner = wkt[wkt.index("("):] if "(" in wkt else ""
    if head == "POINT":
        return ("<map-point><map-coordinates>%s</map-coordinates>"
                "</map-point>" % coords_of(inner.strip("() ")))
    if head == "LINESTRING":
        return ("<map-linestring><map-coordinates>%s</map-coordinates>"
                "</map-linestring>" % coords_of(inner.strip("() ")))
    if head == "MULTIPOINT":
        return ("<map-multipoint><map-coordinates>%s</map-coordinates>"
                "</map-multipoint>"
                % coords_of(inner.strip("() ").replace("(", "")
                            .replace(")", "")))
    if head == "POLYGON":
        rings = re.findall(r"\(([^()]+)\)", inner)
        return "<map-polygon>%s</map-polygon>" % "".join(
            "<map-coordinates>%s</map-coordinates>" % coords_of(r)
            for r in rings)
    if head == "MULTILINESTRING":
        parts = re.findall(r"\(([^()]+)\)", inner)
        return "<map-multilinestring>%s</map-multilinestring>" % "".join(
            "<map-coordinates>%s</map-coordinates>" % coords_of(p)
            for p in parts)
    if head == "MULTIPOLYGON":
        polys = re.findall(r"\(\(([^()]*(?:\)[ ]*,[ ]*\([^()]*)*)\)\)",
                           inner)
        out = []
        for poly in polys:
            rings = [r.strip("() ") for r in poly.split("),(")]
            out.append("<map-polygon>%s</map-polygon>" % "".join(
                "<map-coordinates>%s</map-coordinates>" % coords_of(r)
                for r in rings))
        return ("<map-multipolygon>%s</map-multipolygon>" % "".join(out))
    if head == "GEOMETRYCOLLECTION":
        # split top-level members
        depth = 0
        parts = []
        cur = []
        for ch in inner[1:-1]:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            if ch == "," and depth == 0:
                parts.append("".join(cur).strip())
                cur = []
            else:
                cur.append(ch)
        if cur:
            parts.append("".join(cur).strip())
        return ("<map-geometrycollection>%s</map-geometrycollection>"
                % "".join(_wkt_geom_el(p) for p in parts if p))
    return ""


def mapml_write(layers: dict[str, list[dict]]) -> str:
    """Writer reproducing the reference's map-body layout: per-feature
    map-properties HTML tables + map-geometry markup, and a bbox
    map-extent derived from all coordinates."""
    xs: list[float] = []
    ys: list[float] = []
    feats_xml = []
    for cls, feats in layers.items():
        for i, f in enumerate(feats):
            fid = f.get("fid") if f.get("fid") is not None else i + 1
            rows = []
            for k, v in f.items():
                if k in ("fid", "wkt") or v is None:
                    continue
                rows.append(
                    '              <tr>\n'
                    '                <th scope="row">%s</th>\n'
                    '                <td itemprop="%s">%s</td>\n'
                    '              </tr>\n' % (k, k, v))
            props = ""
            if rows:
                props = (
                    "      <map-properties>\n"
                    '        <div class="table-container" '
                    'aria-labelledby="caption-%s.%s">\n'
                    "          <table>\n"
                    '            <caption id="caption-%s.%s">Feature '
                    "properties</caption>\n"
                    "            <tbody>\n"
                    "              <tr>\n"
                    '                <th role="columnheader" scope="col">'
                    "Property name</th>\n"
                    '                <th role="columnheader" scope="col">'
                    "Property value</th>\n"
                    "              </tr>\n"
                    "%s"
                    "            </tbody>\n"
                    "          </table>\n"
                    "        </div>\n"
                    "      </map-properties>\n"
                    % (cls, fid, cls, fid, "".join(rows)))
            geom = ""
            if f.get("wkt"):
                for pair in re.findall(r"-?[\d.]+ -?[\d.]+", f["wkt"]):
                    x, y = pair.split()
                    xs.append(float(x))
                    ys.append(float(y))
                geom = ("      <map-geometry>\n        %s\n"
                        "      </map-geometry>\n" % _wkt_geom_el(f["wkt"]))
            feats_xml.append(
                '    <map-feature id="%s.%s" class="%s">\n%s%s'
                "    </map-feature>\n" % (cls, fid, cls, props, geom))
    extent = ""
    if xs:
        extent = (
            '    <map-extent units="WGS84" checked="checked">\n'
            '      <map-input name="xmin" type="location" units="gcrs" '
            'axis="longitude" position="top-left" value="%.8f" />\n'
            '      <map-input name="ymin" type="location" units="gcrs" '
            'axis="latitude" position="bottom-right" value="%.8f" />\n'
            '      <map-input name="xmax" type="location" units="gcrs" '
            'axis="longitude" position="bottom-right" value="%.8f" />\n'
            '      <map-input name="ymax" type="location" units="gcrs" '
            'axis="latitude" position="top-left" value="%.8f" />\n'
            "    </map-extent>\n"
            % (min(xs), min(ys), max(xs), max(ys)))
    return ('<mapml- xmlns="http://www.w3.org/1999/xhtml">\n'
            "  <map-head></map-head>\n"
            "  <map-body>\n%s%s  </map-body>\n</mapml->\n"
            % (extent, "".join(feats_xml)))
