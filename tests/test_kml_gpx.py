"""KML + GPX driver parity (ogr/ogrsf_frmts/kml, ogr/ogrsf_frmts/gpx)
against the reference's own autotests (ogr_kml.py, ogr_gpx.py) on its
own data files."""

from __future__ import annotations

import os
import re

import numpy as np
import pytest

from gdal_spark.sources.gpx import parse_gpx
from gdal_spark.sources.kml import parse_kml

KML = "/root/reference/autotest/ogr/data/kml"
GPX = "/root/reference/autotest/ogr/data/gpx"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(KML), reason="reference autotest data not present"
)


def _nums(wkt):
    return np.array(
        [float(v) for v in re.findall(r"-?\d+(?:\.\d+)?(?:[eE][-+]?\d+)?", wkt)]
    )


def _close(a, b):
    na, nb = _nums(a), _nums(b)
    assert na.shape == nb.shape, (a, b)
    np.testing.assert_allclose(na, nb, atol=1e-4)


@pytest.fixture(scope="module")
def samples():
    return {
        l["name"]: l["features"]
        for l in parse_kml(open(f"{KML}/samples.kml").read())
    }


class TestKmlSamples:
    def test_attributes_1(self, samples):
        pm = samples["Placemarks"]
        assert pm[0]["Name"] == "Simple placemark"
        assert pm[0]["description"].startswith("Attached to the ground.")
        assert pm[1]["Name"] == "Floating placemark"
        assert pm[1]["description"] == (
            "Floats a defined distance above the ground."
        )
        assert pm[2]["Name"] == "Extruded placemark"

    def test_attributes_2(self, samples):
        hi = samples["Highlighted Icon"]
        assert hi[0]["Name"] == "Roll over this icon"
        assert hi[0]["description"] == ""
        assert len(hi) == 1

    def test_attributes_3(self, samples):
        pa = samples["Paths"]
        assert pa[0]["Name"] == "Tessellated"
        assert pa[1]["Name"] == "Untessellated"

    def test_attributes_4(self, samples):
        gc = samples["Google Campus"]
        assert [f["Name"] for f in gc] == [f"Building {i}" for i in range(40, 44)]
        assert all(f["description"] == "" for f in gc)

    def test_point_read(self, samples):
        pm = samples["Placemarks"]
        _close(pm[0]["wkt"], "POINT (-122.0822035425683 37.42228990140251 0)")
        _close(pm[1]["wkt"], "POINT (-122.084075 37.4220033612141 50)")
        _close(pm[2]["wkt"], "POINT (-122.0857667006183 37.42156927867553 50)")

    def test_linestring_read(self, samples):
        pa = samples["Paths"]
        _close(
            pa[0]["wkt"],
            "LINESTRING (-112.081423783034495 36.106778704771372 0,"
            "-112.087026775269294 36.0905099328766 0)",
        )
        _close(
            pa[1]["wkt"],
            "LINESTRING (-112.080622229594994 36.106734600079953 0,"
            "-112.085242575314993 36.090495986124218 0)",
        )

    def test_polygon_read(self, samples):
        gc = samples["Google Campus"]
        w = gc[0]["wkt"]
        assert w.startswith("POLYGON Z (")
        v = _nums(w)
        assert abs(v[0] - -122.084893845961204) < 1e-12
        assert abs(v[2] - 17.0) < 1e-12


class TestKmlStructure:
    def test_empty(self):
        assert parse_kml(open(f"{KML}/empty.kml").read()) == []

    def test_emptylayers(self):
        e = parse_kml(open(f"{KML}/emptylayers.kml").read())
        assert [(l["name"], len(l["features"])) for l in e] == [
            ("Layer1", 0), ("Layer2", 0),
        ]

    def test_folder_with_subfolder_placemark(self):
        f = parse_kml(open(f"{KML}/folder_with_subfolder_placemark.kml").read())
        assert [(l["name"], len(l["features"])) for l in f] == [("MainFolder", 0)]

    def test_weird_empty_folders(self):
        w = parse_kml(open(f"{KML}/weird_empty_folders.kml").read())
        assert len(w) == 1 and len(w[0]["features"]) == 0

    def test_duplicate_folder_name(self):
        d = parse_kml(open(f"{KML}/duplicate_folder_name.kml").read())
        assert [l["name"] for l in d] == ["layer", "layer (#2)"]

    def test_placemark_in_root_and_subfolder(self):
        p = parse_kml(open(f"{KML}/placemark_in_root_and_subfolder.kml").read())
        names = {l["name"]: len(l["features"]) for l in p}
        assert names.get("TopLevel") == 1
        assert names.get("SubFolder1") == 1

    def test_non_conformant_multi(self):
        nc = parse_kml(open(f"{KML}/non_conformant_multi.kml").read())
        wkts = [f["wkt"] for f in nc[0]["features"]]
        assert wkts == [
            "MULTIPOLYGON (((0 0,0 1,1 1,1 0,0 0)))",
            "MULTILINESTRING ((0 0,1 1))",
            "MULTIPOINT ((0 0))",
        ]


class TestGpx:
    @pytest.fixture(scope="class")
    def layers(self):
        return parse_gpx(open(f"{GPX}/test.gpx").read())

    def test_waypoints(self, layers):
        w = layers["waypoints"]
        assert [f.get("ele") for f in w] == [2.0, None]
        assert [f.get("name") for f in w] == ["waypoint name", None]
        assert [f.get("link1_href") for f in w] == ["href", None]
        assert [f.get("link1_text") for f in w] == ["text", None]
        assert [f.get("link1_type") for f in w] == ["type", None]
        assert [f.get("link2_href") for f in w] == ["href2", None]
        assert [f.get("time") for f in w] == ["2007/11/25 17:58:00+01", None]
        assert w[0]["wkt"] == "POINT (1 0)"
        assert w[1]["wkt"] == "POINT (4 3)"

    def test_routes(self, layers):
        r = layers["routes"]
        assert r[0]["wkt"] == "LINESTRING (6 5,9 8,12 11)"
        assert r[1]["wkt"] == "LINESTRING EMPTY"

    def test_route_points(self, layers):
        rp = layers["route_points"]
        assert [f.get("name") for f in rp] == ["route point name", None, None]
        assert rp[0]["wkt"] == "POINT (6 5)"
        assert [f["route_fid"] for f in rp] == [0, 0, 0]
        assert [f["route_point_id"] for f in rp] == [0, 1, 2]

    def test_tracks(self, layers):
        t = layers["tracks"]
        assert t[0]["wkt"] == "MULTILINESTRING ((15 14,18 17),(21 20,24 23))"
        assert t[1]["wkt"] == "MULTILINESTRING EMPTY"
        assert t[2]["wkt"] == "MULTILINESTRING EMPTY"

    def test_track_points(self, layers):
        tp = layers["track_points"]
        assert [f.get("name") for f in tp] == [
            "track point name", None, None, None,
        ]
        assert tp[0]["wkt"] == "POINT (15 14)"
        assert tp[0]["track_fid"] == 0
        assert tp[0]["track_seg_id"] == 0
        assert tp[0]["track_seg_point_id"] == 0
        assert [f["track_seg_id"] for f in tp] == [0, 0, 1, 1]


class TestGpxWriter:
    def test_ogr_gpx_8_reference_output(self):
        """write_gpx reproduces data/gpx/ogr_gpx_8_ref.txt byte-exactly
        (grouped route_points/track_points, first-point name rule)."""
        from gdal_spark.sources.gpx import write_gpx

        rp = [
            dict(lon=2, lat=49, route_fid=0, route_name="ROUTE_NAME"),
            dict(lon=3, lat=50, route_fid=0, route_name="--ignored--"),
            dict(lon=3, lat=51, route_fid=1, route_name="ROUTE_NAME2"),
            dict(lon=3, lat=49, route_fid=1),
        ]
        tp = [
            dict(lon=2, lat=49, track_fid=0, track_seg_id=0,
                 track_name="TRACK_NAME"),
            dict(lon=3, lat=50, track_fid=0, track_seg_id=0,
                 track_name="--ignored--"),
            dict(lon=3, lat=51, track_fid=0, track_seg_id=1),
            dict(lon=3, lat=49, track_fid=1, track_seg_id=0,
                 track_name="TRACK_NAME2"),
        ]
        got = write_gpx(route_points=rp, track_points=tp)
        ref = open(f"{GPX}/ogr_gpx_8_ref.txt").read()
        assert ref in got

    def test_waypoint_roundtrip(self):
        from gdal_spark.sources.gpx import write_gpx

        txt = write_gpx(
            waypoints=[
                dict(lon=1.5, lat=0.25, ele=2.0, name="wp",
                     time="2024-03-05T12:34:56Z"),
            ]
        )
        w = parse_gpx(txt)["waypoints"][0]
        assert w["wkt"] == "POINT (1.5 0.25)"
        assert w["ele"] == 2.0 and w["name"] == "wp"
        assert w["time"] == "2024/03/05 12:34:56+00"

    def test_track_roundtrip(self):
        from gdal_spark.sources.gpx import write_gpx

        tp = [
            dict(lon=x, lat=y, track_fid=f, track_seg_id=s)
            for f, s, x, y in [
                (0, 0, 1, 2), (0, 0, 3, 4), (0, 1, 5, 6), (1, 0, 7, 8),
            ]
        ]
        L = parse_gpx(write_gpx(track_points=tp))
        assert L["tracks"][0]["wkt"] == "MULTILINESTRING ((1 2,3 4),(5 6))"
        assert L["tracks"][1]["wkt"] == "MULTILINESTRING ((7 8))"


def _compare_kml(content: str, expected: str):
    """autotest ogr_kml.py compare_output: line count + per-line strip."""
    got = content.strip().split("\n")
    exp = expected.strip().split("\n")
    assert len(got) == len(exp), content
    for g, e in zip(got, exp):
        assert g.strip() == e.strip(), (g, e)


class TestKmlWriter:
    def test_write_schema(self):
        """test_ogr_kml_write_schema expected output, line-exact."""
        from gdal_spark.sources.kml import write_kml

        content = write_kml([
            dict(
                name="lyr",
                fields=[("strfield", "string"), ("intfield", "int"),
                        ("realfield", "float")],
                features=[dict(strfield="strfield_val", intfield=1,
                               realfield=2.34, wkt="POINT (1 2)")],
            )
        ])
        _compare_kml(content, """<?xml version="1.0" encoding="utf-8" ?>
<kml xmlns="http://www.opengis.net/kml/2.2">
<Document id="root_doc">
<Schema name="lyr" id="lyr">
    <SimpleField name="strfield" type="string"></SimpleField>
    <SimpleField name="intfield" type="int"></SimpleField>
    <SimpleField name="realfield" type="float"></SimpleField>
</Schema>
<Folder><name>lyr</name>
  <Placemark id="lyr.1">
    <ExtendedData><SchemaData schemaUrl="#lyr">
        <SimpleData name="strfield">strfield_val</SimpleData>
        <SimpleData name="intfield">1</SimpleData>
        <SimpleData name="realfield">2.34</SimpleData>
    </SchemaData></ExtendedData>
    <Point><coordinates>1,2</coordinates></Point>
  </Placemark>
</Folder>
</Document></kml>""")

    def test_write_empty_layer(self):
        from gdal_spark.sources.kml import write_kml

        _compare_kml(write_kml([dict(name="empty")]),
                     """<?xml version="1.0" encoding="utf-8" ?>
<kml xmlns="http://www.opengis.net/kml/2.2">
<Document id="root_doc">
<Folder><name>empty</name>
</Folder>
</Document></kml>""")

    def test_write_two_layers(self):
        """Empty layer then regular layer: trailing Schema placement
        (the autotest's documented FIXME)."""
        from gdal_spark.sources.kml import write_kml

        content = write_kml([
            dict(name="empty"),
            dict(name="lyr", fields=[("foo", "string")],
                 features=[dict(foo="bar")]),
        ])
        _compare_kml(content, """<?xml version="1.0" encoding="utf-8" ?>
<kml xmlns="http://www.opengis.net/kml/2.2">
<Document id="root_doc">
<Folder><name>empty</name>
</Folder>
<Folder><name>lyr</name>
  <Placemark id="lyr.1">
    <ExtendedData><SchemaData schemaUrl="#lyr">
        <SimpleData name="foo">bar</SimpleData>
    </SchemaData></ExtendedData>
  </Placemark>
</Folder>
<Schema name="lyr" id="lyr">
    <SimpleField name="foo" type="string"></SimpleField>
</Schema>
</Document></kml>""")

    def test_write_1_geometries_roundtrip(self):
        """test_ogr_kml_write_1's geometry set: name/description become
        tags (no Schema), every WKT survives write -> engine read."""
        from gdal_spark.sources.kml import parse_kml, write_kml

        wkts = [
            "POINT (2 49)",
            "POINT (2 49 1)",
            "LINESTRING (0 1,2 3)",
            "POLYGON ((0 1,2 3,4 5,0 1),(0 1,2 3,4 5,0 1))",
            "MULTIPOINT (2 49,2 49)",
            "MULTILINESTRING ((0 1,2 3),(0 1,2 3))",
            "MULTIPOLYGON (((0 1,2 3,4 5,0 1),(0 1,2 3,4 5,0 1)),"
            "((0 1,2 3,4 5,0 1),(0 1,2 3,4 5,0 1)))",
            "GEOMETRYCOLLECTION (POINT (2 49 1),LINESTRING (0 1 0,2 3 0))",
        ]
        feats = [dict(name="my_name", description="my_description",
                      wkt=wkts[0])]
        feats += [dict(wkt=w) for w in wkts[1:]]
        content = write_kml([
            dict(name="test_wgs84",
                 fields=[("name", "string"), ("description", "string")],
                 features=feats)
        ])
        assert "Schema" not in content
        assert "\t<name>my_name</name>\n" in content
        assert "\t<description>my_description</description>\n" in content
        # polygon/line features carry the default style, points don't
        assert content.count(
            "<Style><LineStyle><color>ff0000ff</color></LineStyle>"
            "<PolyStyle><fill>0</fill></PolyStyle></Style>") == 4

        layers = parse_kml(content)
        assert len(layers) == 1
        got = [f["wkt"] for f in layers[0]["features"]]
        assert len(got) == 8
        assert got[0] == "POINT (2 49)"
        # the engine reader emits ISO WKT (Z keyword) for 2.5D
        assert got[1] == "POINT Z (2 49 1)"
        assert got[2] == "LINESTRING (0 1,2 3)"
        assert layers[0]["features"][0]["Name"] == "my_name"
        assert layers[0]["features"][0]["description"] == "my_description"

    def test_pen_style_and_geometry_fragment(self):
        from gdal_spark.sources.kml import geometry_to_kml, write_kml

        # OGR color #rrggbbaa -> KML aabbggrr
        content = write_kml([
            dict(name="l", fields=[],
                 features=[dict(wkt="LINESTRING (0 0,1 1)",
                                style="PEN(c:#11223344,w:2px)")]),
        ])
        assert "<LineStyle><color>44332211</color><width>2</width>" in content
        assert geometry_to_kml("POINT (2 49 1)", "absolute") == (
            "<Point><altitudeMode>absolute</altitudeMode>"
            "<coordinates>2,49,1</coordinates></Point>"
        )
        assert geometry_to_kml("POINT EMPTY") == "<Point/>"
        # lat pole snap + lon wrap (MakeKMLCoordinate)
        assert geometry_to_kml("POINT (190 90.000000001)") == (
            "<Point><coordinates>-170,90</coordinates></Point>"
        )
