"""OGC JSON-FG driver (ogr/ogrsf_frmts/jsonfg — re-derived).

Facts:
  - identified by conformsTo entries matching "[ogc-json-fg-*" (or the
    full URI form) on Feature / FeatureCollection documents
  - features group into layers by their (or the collection's)
    "featureType"; no type -> one layer per geometry arity
  - "place" (when non-null) supersedes "geometry" and is expressed in
    coordRefSys; coordRefSys accepts the "[AUTH:CODE]" curie, the OGC
    URI form, {"type":"Reference","href":...} objects and
    single-element arrays of those
  - "time" maps to fields: {"date"} -> time (Date, YYYY/MM/DD),
    {"timestamp"} -> time (DateTime, +00), {"interval": [a, b]} ->
    time_start/time_end with ".." rendering as null
"""

from __future__ import annotations

import json
import re

__all__ = ["jsonfg_layers", "read_jsonfg", "geojson_geom_to_wkt"]


def _fmt(v) -> str:
    return "%.15g" % float(v)


def _coords(c) -> str:
    return " ".join(_fmt(x) for x in c)


def geojson_geom_to_wkt(g: dict | None) -> str | None:
    if not g or not isinstance(g, dict):
        return None
    t = g.get("type")
    c = g.get("coordinates")
    z = ""

    def dim_tag(coords, depth):
        probe = coords
        for _ in range(depth):
            if not probe:
                return ""
            probe = probe[0]
        return " Z" if isinstance(probe, list) and False else ""

    if t == "Point":
        if not c:
            return "POINT EMPTY"
        return "POINT%s (%s)" % (" Z" if len(c) > 2 else "", _coords(c))
    if t == "MultiPoint":
        if not c:
            return "MULTIPOINT EMPTY"
        zt = " Z" if c and len(c[0]) > 2 else ""
        return "MULTIPOINT%s (%s)" % (zt, ",".join(
            "(%s)" % _coords(p) for p in c))
    if t == "LineString":
        if not c:
            return "LINESTRING EMPTY"
        zt = " Z" if c and len(c[0]) > 2 else ""
        return "LINESTRING%s (%s)" % (zt, ",".join(_coords(p) for p in c))
    if t == "MultiLineString":
        if not c:
            return "MULTILINESTRING EMPTY"
        zt = " Z" if c and c[0] and len(c[0][0]) > 2 else ""
        return "MULTILINESTRING%s (%s)" % (zt, ",".join(
            "(%s)" % ",".join(_coords(p) for p in ln) for ln in c))
    if t == "Polygon":
        if not c:
            return "POLYGON EMPTY"
        zt = " Z" if c and c[0] and len(c[0][0]) > 2 else ""
        return "POLYGON%s (%s)" % (zt, ",".join(
            "(%s)" % ",".join(_coords(p) for p in ring) for ring in c))
    if t == "MultiPolygon":
        if not c:
            return "MULTIPOLYGON EMPTY"
        zt = " Z" if c and c[0] and c[0][0] and len(c[0][0][0]) > 2 else ""
        return "MULTIPOLYGON%s (%s)" % (zt, ",".join(
            "(%s)" % ",".join(
                "(%s)" % ",".join(_coords(p) for p in ring)
                for ring in poly) for poly in c))
    if t == "GeometryCollection":
        geoms = g.get("geometries") or []
        return "GEOMETRYCOLLECTION (%s)" % ",".join(
            w for w in (geojson_geom_to_wkt(sub) for sub in geoms) if w)
    if t == "Polyhedron":
        # JSON-FG extension: collection of multipolygon shells
        shells = c or []
        return "POLYHEDRALSURFACE Z (%s)" % ",".join(
            ",".join("(%s)" % ",".join(
                "(%s)" % ",".join(_coords(p) for p in ring)
                for ring in poly) for poly in shell) for shell in shells)
    return None


_CURIE_RE = re.compile(r"^\[([A-Za-z0-9_-]+):([0-9]+)\]$")
_URI_RE = re.compile(
    r"^https?://www\.opengis\.net/def/crs/([A-Za-z0-9_-]+)/[0-9.]+/"
    r"([0-9]+)$")


def parse_coord_ref_sys(v) -> str | None:
    """-> 'AUTH:CODE' or None when unparseable (the reference falls
    back to the default CRS)."""
    if isinstance(v, list):
        if len(v) != 1:
            return None
        v = v[0]
    if isinstance(v, dict):
        if v.get("type") != "Reference":
            return None
        epoch = v.get("epoch")
        if epoch is not None and not isinstance(epoch, (int, float)):
            return None
        v = v.get("href")
    if not isinstance(v, str):
        return None
    m = _CURIE_RE.match(v) or _URI_RE.match(v)
    if not m or int(m.group(2)) == 0:
        return None
    return "%s:%s" % (m.group(1), m.group(2))


def _norm_dt(s: str) -> str:
    s = s.replace("T", " ").replace("Z", "+00")
    return s[:10].replace("-", "/") + s[10:]


def _time_fields(t) -> dict:
    if not isinstance(t, dict):
        return {}
    if "date" in t:
        return {"time": t["date"].replace("-", "/")}
    if "timestamp" in t:
        return {"time": _norm_dt(t["timestamp"])}
    if "interval" in t and isinstance(t["interval"], list) and \
            len(t["interval"]) == 2:
        a, b = t["interval"]

        def conv(x):
            if x == ".." or x is None:
                return None
            return _norm_dt(x) if "T" in x else x.replace("-", "/")

        return {"time_start": conv(a), "time_end": conv(b)}
    return {}


def is_jsonfg(doc: dict) -> bool:
    ct = doc.get("conformsTo")
    if isinstance(ct, list):
        for item in ct:
            if isinstance(item, str) and (
                    item.startswith("[ogc-json-fg-")
                    or "/ogc-json-fg-" in item):
                return True
    return False


def jsonfg_layers(data: bytes | str) -> dict[str, dict]:
    text = data.decode("utf-8", "replace") if isinstance(data, bytes) \
        else data
    doc = json.loads(text)
    if not is_jsonfg(doc):
        raise ValueError("not a JSON-FG document")
    default_type = doc.get("featureType")
    crs = parse_coord_ref_sys(doc.get("coordRefSys")) \
        if "coordRefSys" in doc else None
    feats = doc["features"] if doc.get("type") == "FeatureCollection" \
        else [doc]

    layers: dict[str, dict] = {}
    for f in feats:
        ftype = f.get("featureType") or default_type or "features"
        if isinstance(ftype, list):
            ftype = ftype[0] if ftype else "features"
        lyr = layers.setdefault(str(ftype), {"features": [], "crs": crs})
        place = f.get("place")
        geom = place if place is not None else f.get("geometry")
        fcrs = parse_coord_ref_sys(f.get("coordRefSys")) \
            if "coordRefSys" in f else None
        feat = {"fid": f.get("id"),
                "wkt": geojson_geom_to_wkt(geom),
                "from_place": place is not None}
        if fcrs:
            feat["crs"] = fcrs
        feat.update(_time_fields(f.get("time")))
        for k, v in (f.get("properties") or {}).items():
            feat[k] = v
        lyr["features"].append(feat)
    return layers


def read_jsonfg(spark, path: str):
    with open(path, "rb") as fh:
        layers = jsonfg_layers(fh.read())
    rows = []
    for name, lyr in layers.items():
        for f in lyr["features"]:
            rows.append((name, f.get("fid"), f.get("wkt"),
                         {k: str(v) for k, v in f.items()
                          if k not in ("fid", "wkt") and v is not None}))
    return spark.createDataFrame(
        rows, "layer string, fid bigint, wkt string, "
              "fields map<string,string>")
