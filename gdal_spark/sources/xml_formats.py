"""XML vector formats: GPX (tracks/waypoints) and KML (placemarks).

Reference drivers: ogr/ogrsf_frmts/gpx/ (waypoints, route points, track
points and tracks-as-linestrings layers) and ogr/ogrsf_frmts/kml/
(placemark Point/LineString/Polygon). Parsed with the stdlib
ElementTree — both formats are small-file interchange containers, so the
distributed shape is many-files-per-task (one task row per file, like
gridfmts.read_grid_files), not byte-range splitting of one file.

Feature model matches vector_formats.py: (fid, wkb, *attrs).
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from gdal_spark.functions import wkb as W

GPX_NS = "http://www.topografix.com/GPX/1/1"
KML_NS = "http://www.opengis.net/kml/2.2"


def _strip(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


# --------------------------------------------------------------------------
# GPX
# --------------------------------------------------------------------------


def parse_gpx(data: bytes) -> list[dict]:
    """GPX bytes -> feature dicts. Layers mirror the OGR GPX driver:
    'waypoints' (one point per <wpt>) and 'tracks' (one linestring per
    <trk>, segments concatenated)."""
    root = ET.fromstring(data)
    feats = []
    for el in root:
        tag = _strip(el.tag)
        if tag == "wpt":
            name = el.findtext(f"{{{GPX_NS}}}name") or el.findtext("name")
            ele = el.findtext(f"{{{GPX_NS}}}ele") or el.findtext("ele")
            feats.append(
                {
                    "layer": "waypoints",
                    "wkb": W.write_point(float(el.get("lon")), float(el.get("lat"))),
                    "name": name,
                    "ele": float(ele) if ele is not None else None,
                }
            )
        elif tag == "trk":
            name = el.findtext(f"{{{GPX_NS}}}name") or el.findtext("name")
            pts = []
            for seg in el:
                if _strip(seg.tag) != "trkseg":
                    continue
                for pt in seg:
                    if _strip(pt.tag) == "trkpt":
                        pts.append((float(pt.get("lon")), float(pt.get("lat"))))
            if pts:
                feats.append(
                    {
                        "layer": "tracks",
                        "wkb": W.write_linestring(np.asarray(pts, np.float64)),
                        "name": name,
                        "ele": None,
                    }
                )
    return feats


def write_gpx(feats: list[dict], path: str) -> None:
    """Feature dicts (point/linestring wkb + name/ele) -> GPX 1.1."""
    out = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        f'<gpx version="1.1" creator="gdal_spark" xmlns="{GPX_NS}">',
    ]
    for f in feats:
        gtype, payload = W.parse(f["wkb"])
        name = f.get("name")
        nm = f"<name>{name}</name>" if name else ""
        if gtype == W.WKB_POINT:
            x, y = payload
            ele = f.get("ele")
            el = f"<ele>{ele!r}</ele>" if ele is not None else ""
            out.append(f'<wpt lat="{y!r}" lon="{x!r}">{el}{nm}</wpt>')
        elif gtype == W.WKB_LINESTRING:
            pts = "".join(
                f'<trkpt lat="{y!r}" lon="{x!r}"/>' for x, y in payload
            )
            out.append(f"<trk>{nm}<trkseg>{pts}</trkseg></trk>")
        else:
            raise ValueError("GPX carries points and linestrings only")
    out.append("</gpx>")
    with open(path, "w", encoding="utf-8") as fh:
        fh.write("\n".join(out) + "\n")


# --------------------------------------------------------------------------
# KML
# --------------------------------------------------------------------------


def _kml_coords(text: str) -> np.ndarray:
    pts = []
    for tok in text.split():
        parts = tok.split(",")
        pts.append((float(parts[0]), float(parts[1])))
    return np.asarray(pts, np.float64)


def parse_kml(data: bytes) -> list[dict]:
    """KML bytes -> placemark features (Point/LineString/Polygon with
    outer + inner boundaries)."""
    root = ET.fromstring(data)
    feats = []
    for pm in root.iter():
        if _strip(pm.tag) != "Placemark":
            continue
        name = None
        geom = None
        for child in pm:
            tag = _strip(child.tag)
            if tag == "name":
                name = child.text
            elif tag == "Point":
                c = child.findtext(f"{{{KML_NS}}}coordinates") or child.findtext(
                    "coordinates"
                )
                pts = _kml_coords(c)
                geom = W.write_point(float(pts[0, 0]), float(pts[0, 1]))
            elif tag == "LineString":
                c = child.findtext(f"{{{KML_NS}}}coordinates") or child.findtext(
                    "coordinates"
                )
                geom = W.write_linestring(_kml_coords(c))
            elif tag == "Polygon":
                rings = []
                for bound in child.iter():
                    bt = _strip(bound.tag)
                    if bt in ("outerBoundaryIs", "innerBoundaryIs"):
                        for lr in bound.iter():
                            if _strip(lr.tag) == "coordinates":
                                ring = _kml_coords(lr.text)
                                if bt == "outerBoundaryIs":
                                    rings.insert(0, ring)  # exterior first
                                else:
                                    rings.append(ring)
                geom = W.write_polygon(rings)
        if geom is not None:
            feats.append({"layer": "placemarks", "wkb": geom, "name": name, "ele": None})
    return feats


def write_kml(feats: list[dict], path: str) -> None:
    out = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        f'<kml xmlns="{KML_NS}"><Document>',
    ]
    for f in feats:
        gtype, payload = W.parse(f["wkb"])
        name = f.get("name")
        nm = f"<name>{name}</name>" if name else ""
        if gtype == W.WKB_POINT:
            x, y = payload
            g = f"<Point><coordinates>{x!r},{y!r}</coordinates></Point>"
        elif gtype == W.WKB_LINESTRING:
            c = " ".join(f"{x!r},{y!r}" for x, y in payload)
            g = f"<LineString><coordinates>{c}</coordinates></LineString>"
        elif gtype == W.WKB_POLYGON:
            parts = []
            for i, ring in enumerate(payload):
                c = " ".join(f"{x!r},{y!r}" for x, y in ring)
                b = "outerBoundaryIs" if i == 0 else "innerBoundaryIs"
                parts.append(
                    f"<{b}><LinearRing><coordinates>{c}</coordinates></LinearRing></{b}>"
                )
            g = "<Polygon>" + "".join(parts) + "</Polygon>"
        else:
            raise ValueError("KML writer supports Point/LineString/Polygon")
        out.append(f"<Placemark>{nm}{g}</Placemark>")
    out.append("</Document></kml>")
    with open(path, "w", encoding="utf-8") as fh:
        fh.write("\n".join(out) + "\n")


# --------------------------------------------------------------------------
# distributed loader
# --------------------------------------------------------------------------

_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("layer", T.StringType()),
        T.StructField("fid", T.LongType()),
        T.StructField("wkb", T.BinaryType()),
        T.StructField("name", T.StringType()),
        T.StructField("ele", T.DoubleType()),
    ]
)


def read_xml_features(
    spark: SparkSession, files: list[str], num_partitions: int | None = None
) -> DataFrame:
    """[(gpx|kml files)] -> (path, layer, fid, wkb, name, ele); format
    sniffed per file from the root element. One file per task row."""
    fdf = spark.createDataFrame([(p,) for p in files], "path: string")
    if num_partitions:
        fdf = fdf.repartition(num_partitions)

    def run(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                raw = open(r.path, "rb").read()
                root_tag = _strip(ET.fromstring(raw).tag)
                feats = parse_gpx(raw) if root_tag == "gpx" else parse_kml(raw)
                for i, f in enumerate(feats):
                    rows.append(
                        (r.path, f["layer"], i, f["wkb"], f.get("name"), f.get("ele"))
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in _SCHEMA.fields])

    return fdf.mapInPandas(run, _SCHEMA)
