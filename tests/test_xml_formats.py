"""GPX/KML drivers (sources/xml_formats.py): round-trips, foreign files,
and the distributed mixed-format loader."""

from __future__ import annotations

import numpy as np

from gdal_spark.functions import wkb as W
from gdal_spark.sources import xml_formats as XF


def _feats():
    return [
        {"layer": "waypoints", "wkb": W.write_point(11.25, 47.5), "name": "summit", "ele": 2650.5},
        {"layer": "waypoints", "wkb": W.write_point(-3.5, 40.25), "name": None, "ele": None},
        {
            "layer": "tracks",
            "wkb": W.write_linestring(np.array([[0.0, 0.0], [1.5, 0.5], [2.0, 2.0]])),
            "name": "run",
            "ele": None,
        },
    ]


def test_gpx_roundtrip(tmp_path):
    p = str(tmp_path / "a.gpx")
    XF.write_gpx(_feats(), p)
    back = XF.parse_gpx(open(p, "rb").read())
    assert [f["layer"] for f in back] == ["waypoints", "waypoints", "tracks"]
    assert back[0]["name"] == "summit" and back[0]["ele"] == 2650.5
    assert W.parse(back[0]["wkb"])[1] == (11.25, 47.5)
    np.testing.assert_array_equal(
        W.parse(back[2]["wkb"])[1], W.parse(_feats()[2]["wkb"])[1]
    )


def test_gpx_foreign_multiseg_track():
    raw = b"""<?xml version="1.0"?>
<gpx version="1.1" creator="x" xmlns="http://www.topografix.com/GPX/1/1">
 <trk><name>hike</name>
  <trkseg><trkpt lat="1.0" lon="2.0"/><trkpt lat="1.5" lon="2.5"/></trkseg>
  <trkseg><trkpt lat="2.0" lon="3.0"/></trkseg>
 </trk>
</gpx>"""
    feats = XF.parse_gpx(raw)
    assert len(feats) == 1 and feats[0]["name"] == "hike"
    pts = W.parse(feats[0]["wkb"])[1]
    assert pts.shape == (3, 2)  # segments concatenated
    assert tuple(pts[2]) == (3.0, 2.0)


def test_kml_roundtrip_polygon_with_hole(tmp_path):
    outer = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], float)
    hole = np.array([[3, 3], [3, 5], [5, 5], [5, 3], [3, 3]], float)
    feats = [
        {"layer": "placemarks", "wkb": W.write_point(5.5, -2.25), "name": "pin"},
        {"layer": "placemarks", "wkb": W.write_polygon([outer, hole]), "name": "zone"},
    ]
    p = str(tmp_path / "b.kml")
    XF.write_kml(feats, p)
    back = XF.parse_kml(open(p, "rb").read())
    assert [f["name"] for f in back] == ["pin", "zone"]
    rings = W.polygon_rings(back[1]["wkb"])[0]
    assert len(rings) == 2
    np.testing.assert_array_equal(rings[0], outer)
    np.testing.assert_array_equal(rings[1], hole)


def test_kml_foreign_namespaced_doc():
    raw = b"""<?xml version="1.0"?>
<kml xmlns="http://www.opengis.net/kml/2.2"><Document><Folder>
 <Placemark><name>hq</name>
  <Point><coordinates>-122.08,37.42,0</coordinates></Point>
 </Placemark>
</Folder></Document></kml>"""
    feats = XF.parse_kml(raw)
    assert len(feats) == 1
    assert W.parse(feats[0]["wkb"])[1] == (-122.08, 37.42)


def test_read_xml_features_mixed(spark, tmp_path):
    g = str(tmp_path / "t.gpx")
    XF.write_gpx(_feats(), g)
    k = str(tmp_path / "t.kml")
    XF.write_kml(
        [{"layer": "placemarks", "wkb": W.write_point(1.0, 2.0), "name": "p"}], k
    )
    df = XF.read_xml_features(spark, [g, k], num_partitions=2)
    rows = df.collect()
    assert len(rows) == 4
    layers = {r["layer"] for r in rows}
    assert layers == {"waypoints", "tracks", "placemarks"}
    by_name = {r["name"]: r for r in rows if r["name"]}
    assert by_name["summit"]["ele"] == 2650.5
