"""NAS (German ALKIS/AAA cadastre exchange) reader
(ogr/ogrsf_frmts/nas — re-derived, no code copied).

NAS files are GML 3.2 documents carrying wfs:Transaction update
operations alongside AAA feature objects:

  wfs:Delete typeName=... + ogc:Filter/ogc:FeatureId fid -> a feature
  of the synthetic "Delete" layer with fields typeName / FeatureId /
  context="Delete".
  wfsext:Replace safeToIgnore=... -> the replacing feature object
  (its own layer, named by its element, gml_id field + flattened leaf
  elements) AND a Delete-layer feature with context="Replace",
  replacedBy = the new object's gml:id and the safeToIgnore
  attribute (nasreaderp / nashandler semantics checked against
  autotest/ogr/ogr_nas.py expectations).
  wfs:Insert -> the inserted feature objects.

Leaf elements flatten into fields by local name (numeric strings
convert to int/float); geometry elements are handed to the engine's
GML geometry codec.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

__all__ = ["nas_read"]

_GEOM_TAGS = {
    "Point", "LineString", "Curve", "Polygon", "Surface", "MultiPoint",
    "MultiCurve", "MultiSurface", "MultiLineString", "MultiPolygon",
    "CompositeCurve", "position",
}


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _gml_id(el) -> str | None:
    for k, v in el.attrib.items():
        if _local(k) == "id":
            return v
    return None


def _flatten(el, fields: dict) -> None:
    """Collect leaf text elements into fields (repeats -> last wins,
    matching the simple-field view the autotest checks)."""
    for child in el:
        name = _local(child.tag)
        if name in _GEOM_TAGS:
            continue
        text = (child.text or "").strip()
        if len(child) == 0:
            if text:
                fields[name] = _coerce(text)
        else:
            _flatten(child, fields)


def _coerce(text: str):
    try:
        return int(text)
    except ValueError:
        try:
            return float(text)
        except ValueError:
            return text


def _feature(el) -> dict:
    fields: dict = {"gml_id": _gml_id(el)}
    _flatten(el, fields)
    geom_wkt = None
    for node in el.iter():
        if _local(node.tag) in ("Polygon", "Surface", "Point",
                                "LineString", "Curve"):
            try:
                from gdal_spark.sources.gml import gml_to_wkt
                geom_wkt = gml_to_wkt(ET.tostring(node, encoding="unicode"))
            except Exception:
                geom_wkt = None
            break
    return {"layer": _local(el.tag), "fields": fields, "wkt": geom_wkt}


def nas_read(data: bytes) -> dict[str, list[dict]]:
    """-> {layer name: [ {fields...} ]} incl. the synthetic Delete
    layer."""
    root = ET.fromstring(data)
    layers: dict[str, list[dict]] = {}

    def add(layer: str, fields: dict, wkt=None):
        layers.setdefault(layer, []).append(
            {"fields": fields, "wkt": wkt})

    for node in root.iter():
        name = _local(node.tag)
        if name == "Delete":
            type_name = node.attrib.get("typeName", "")
            for fid_el in node.iter():
                if _local(fid_el.tag) == "FeatureId":
                    add("Delete", {
                        "typeName": type_name.split(":")[-1],
                        "FeatureId": fid_el.attrib.get("fid", ""),
                        "context": "Delete",
                    })
        elif name == "Replace":
            safe = node.attrib.get("safeToIgnore", "")
            obj = None
            fid = ""
            for child in node:
                cname = _local(child.tag)
                if cname == "Filter":
                    for fe in child.iter():
                        if _local(fe.tag) == "FeatureId":
                            fid = fe.attrib.get("fid", "")
                elif cname not in ("Filter",):
                    obj = child
            if obj is not None:
                feat = _feature(obj)
                add(feat["layer"], feat["fields"], feat["wkt"])
                add("Delete", {
                    "typeName": _local(obj.tag),
                    "FeatureId": fid,
                    "context": "Replace",
                    "replacedBy": _gml_id(obj) or "",
                    "safeToIgnore": safe,
                })
        elif name == "Insert":
            for child in node:
                feat = _feature(child)
                add(feat["layer"], feat["fields"], feat["wkt"])
    return layers
