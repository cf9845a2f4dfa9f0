"""KML driver (read path) — ogr/ogrsf_frmts/kml (kmlnode.cpp,
kmlvector.cpp, ogrkmldatasource.cpp).

Layer discovery is the reference's exact three-stage pipeline:

1. classify (kmlnode.cpp:194-295): geometry leaves get their type;
   containers merge child types (conflicts -> Mixed, or Multi* under a
   MultiGeometry/MultiPolygon/MultiLineString/MultiPoint parent, incl.
   the non-conformant forms); ``coordinates`` content with two commas
   flags 2.5D, propagated upward.
2. hasOnlyEmpty / eliminateEmpty (ogrkmldatasource.cpp:146-150):
   when at least one node is non-Empty, Empty containers and feature
   containers are deleted up front.
3. findLayers (kmlvector.cpp:60-117): a Folder/Document is a layer
   when it directly contains a feature container (Placemark / Multi*);
   in keep-empty mode (whole file Empty) every Folder is registered,
   but a non-empty Folder then eliminates (and UNREGISTERS) its Empty
   children — reproducing the subfolder-unregistration subtlety.

Layer names come from the <name> child ("Layer #N" fallback,
"name (#k)" de-duplication — ogrkmldatasource.cpp:215-233). Features
are the layer node's DIRECT Placemark children (kmlnode.cpp:479-493)
carrying Name, description, ExtendedData/SchemaData SimpleData fields,
and the classified geometry as WKT.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

_CONTAINERS = ("Folder", "Document", "kml")
_FEATURE_CONTAINERS = (
    "MultiGeometry", "MultiPolygon", "MultiLineString", "MultiPoint",
    "Placemark",
)
_FEATURES = ("Polygon", "LineString", "Point")
_REST = ("outerBoundaryIs", "innerBoundaryIs", "LinearRing")
_MULTI = ("MultiGeometry", "MultiPolygon", "MultiLineString", "MultiPoint")


def _strip(tag) -> str:
    return tag.rsplit("}", 1)[-1] if isinstance(tag, str) else ""


class _Node:
    def __init__(self, el):
        self.name = _strip(el.tag)
        self.el = el
        self.children = [_Node(c) for c in el if isinstance(c.tag, str)]
        self.type = "Unknown"
        self.b25d = False

    def classify(self):
        if self.name in ("Point", "LineString", "Polygon"):
            self.type = self.name
        elif self.name in _REST:
            self.type = "Empty"
        elif self.name == "coordinates":
            for tup in (self.el.text or "").split():
                if tup.count(",") == 2:
                    self.b25d = True
        elif self.name in ("Schema", "SimpleField", "SchemaData", "SimpleData"):
            self.type = self.name

        all_t = "Empty"
        for ch in self.children:
            ch.classify()
            cur = ch.type
            if cur in ("SchemaData", "SimpleData"):
                continue
            self.b25d |= ch.b25d
            if cur != all_t and all_t != "Empty" and cur != "Empty":
                self.type = (
                    "MultiGeometry" if self.name in _MULTI else "Mixed"
                )
            elif cur != "Empty":
                all_t = cur
        if self.type == "Unknown":
            if self.name in _MULTI:
                self.type = {
                    "Point": "MultiPoint",
                    "LineString": "MultiLineString",
                    "Polygon": "MultiPolygon",
                }.get(all_t, "MultiGeometry")
            else:
                self.type = all_t

    def has_only_empty(self) -> bool:
        for ch in self.children:
            if ch.type != "Empty":
                return False
            if not ch.has_only_empty():
                return False
        return True

    def eliminate_empty(self, unregister):
        kept = []
        for ch in self.children:
            if ch.type == "Empty" and (
                ch.name in _CONTAINERS or ch.name in _FEATURE_CONTAINERS
            ):
                ch._unregister_all(unregister)
            else:
                ch.eliminate_empty(unregister)
                kept.append(ch)
        self.children = kept

    def _unregister_all(self, unregister):
        unregister(self)
        for ch in self.children:
            ch._unregister_all(unregister)

    def name_element(self) -> str:
        for ch in self.children:
            if ch.name == "name":
                return (ch.el.text or "").strip()
        return ""

    def description_element(self) -> str:
        for ch in self.children:
            if ch.name == "description":
                return (ch.el.text or "").strip()
        return ""


def _find_layers(node: _Node, keep_empty: bool, layers: list) -> None:
    if (
        node.name in _FEATURES
        or node.name in _FEATURE_CONTAINERS
        or (node.name in _REST and node.name != "kml")
    ):
        return
    if node.name not in _CONTAINERS:
        return
    empty = True
    for ch in node.children:
        if ch.name in _CONTAINERS:
            _find_layers(ch, keep_empty, layers)
        elif ch.name in _FEATURE_CONTAINERS:
            empty = False
    if keep_empty and node.name == "Folder":
        if not empty:
            node.eliminate_empty(
                lambda n: layers.remove(n) if n in layers else None
            )
    elif empty:
        return
    if keep_empty or node.type in (
        "Point", "LineString", "Polygon", "Mixed", "MultiGeometry",
        "MultiPoint", "MultiLineString", "MultiPolygon",
    ):
        layers.append(node)


def _fmt(v: float) -> str:
    return f"{v:.15g}"


def _coords(node: _Node, want_z: bool):
    for ch in node.children:
        if ch.name == "coordinates":
            out = []
            for tup in (ch.el.text or "").split():
                parts = tup.split(",")
                x, y = float(parts[0]), float(parts[1])
                z = float(parts[2]) if len(parts) > 2 else 0.0
                out.append((x, y, z) if want_z else (x, y))
            return out
    return []


def _coord_str(pts) -> str:
    return ",".join(" ".join(_fmt(v) for v in p) for p in pts)


def _geom_wkt(node: _Node, want_z: bool) -> str | None:
    if node.name == "Point":
        pts = _coords(node, want_z)
        if not pts:
            return None
        return ("POINT Z (" if want_z else "POINT (") + _coord_str(pts[:1]) + ")"
    if node.name == "LineString":
        pts = _coords(node, want_z)
        return (
            ("LINESTRING Z (" if want_z else "LINESTRING (")
            + _coord_str(pts) + ")"
        )
    if node.name == "Polygon":
        rings = []
        for ch in node.children:
            if ch.name in ("outerBoundaryIs", "innerBoundaryIs"):
                for lr in ch.children:
                    if lr.name == "LinearRing":
                        rings.append(_coord_str(_coords(lr, want_z)))
        return (
            ("POLYGON Z (" if want_z else "POLYGON (")
            + ",".join(f"({r})" for r in rings) + ")"
        )
    return None


def _placemark_geom(pm: _Node) -> str | None:
    want_z = pm.b25d
    if pm.type in ("Point", "LineString", "Polygon"):
        for ch in pm.children:
            if ch.name == pm.type:
                return _geom_wkt(ch, want_z)
    elif pm.type in ("MultiGeometry", "MultiPoint", "MultiLineString",
                     "MultiPolygon"):
        parts = []
        for ch in pm.children:
            if ch.name in _MULTI:
                for g in ch.children:
                    w = _geom_wkt(g, want_z)
                    if w:
                        parts.append(w)
        tag = {
            "MultiPoint": "MULTIPOINT",
            "MultiLineString": "MULTILINESTRING",
            "MultiPolygon": "MULTIPOLYGON",
            "MultiGeometry": "GEOMETRYCOLLECTION",
        }[pm.type]
        if tag == "GEOMETRYCOLLECTION":
            return tag + " (" + ",".join(parts) + ")"
        # homogeneous: member bodies without their type tags
        bodies = []
        for ch in pm.children:
            if ch.name in _MULTI:
                for g in ch.children:
                    b = _geom_body(g, want_z)
                    if b is not None:
                        bodies.append(b)
        return tag + (" Z (" if want_z else " (") + ",".join(bodies) + ")"
    return None


def _geom_body(node: _Node, want_z: bool) -> str | None:
    """WKT body of a member geometry (no type tag): point -> 'x y',
    linestring -> '(x y,...)', polygon -> '((ring),...)'."""
    if node.name == "Point":
        pts = _coords(node, want_z)
        return "(" + _coord_str(pts[:1]) + ")" if pts else None
    if node.name == "LineString":
        return "(" + _coord_str(_coords(node, want_z)) + ")"
    if node.name == "Polygon":
        rings = []
        for ch in node.children:
            if ch.name in ("outerBoundaryIs", "innerBoundaryIs"):
                for lr in ch.children:
                    if lr.name == "LinearRing":
                        rings.append(_coord_str(_coords(lr, want_z)))
        return "(" + ",".join(f"({r})" for r in rings) + ")"
    return None


def _simple_data_fields(pm: _Node) -> dict:
    out = {}
    for ch in pm.children:
        if ch.name != "ExtendedData":
            continue
        if len(ch.children) == 1 and ch.children[0].name == "SchemaData":
            for sd in ch.children[0].children:
                if sd.name == "SimpleData":
                    nm = sd.el.get("name")
                    if nm and sd.el.text is not None:
                        out[nm] = sd.el.text
    return out


def parse_kml(text: str) -> list[dict]:
    """-> [{'name': layer_name, 'features': [{'Name', 'description',
    'wkt', fields...}]}] in the reference's layer order."""
    root = ET.fromstring(text)
    trunk = _Node(root)
    if trunk.name != "kml":
        # the reference wraps everything under the kml trunk
        wrapper = ET.Element("kml")
        wrapper.append(root)
        trunk = _Node(wrapper)
    trunk.classify()
    only_empty = trunk.has_only_empty() and trunk.type == "Empty"
    layers: list[_Node] = []
    if not only_empty:
        trunk.eliminate_empty(lambda n: None)
    _find_layers(trunk, only_empty, layers)

    out = []
    seen: dict[str, int] = {}
    for i, node in enumerate(layers):
        nm = node.name_element()
        if not nm:
            nm = f"Layer #{i}"
        if nm in seen:
            seen[nm] += 1
            nm = f"{nm} (#{seen[nm]})"
        else:
            seen[nm] = 1
        feats = []
        for ch in node.children:
            if ch.name != "Placemark":
                continue
            wkt = _placemark_geom(ch)
            if wkt is None and not only_empty:
                continue
            f = {
                "Name": ch.name_element(),
                "description": ch.description_element(),
                "wkt": wkt,
            }
            f.update(_simple_data_fields(ch))
            feats.append(f)
        out.append({"name": nm, "features": feats})
    return out
