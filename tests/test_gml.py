"""GML parity (ogr/gml2ogrgeometry.cpp via autotest/ogr/ogr_gml_geom.py
expected-WKT matrix + the archsites.gml WFS fixture)."""

import numpy as np
import pytest

from gdal_spark.functions.geomops import parse_wkt_any
from gdal_spark.sources.gml import (
    gml_to_wkt,
    parse_gml_features,
    read_gml,
    wkt_to_gml,
)

# (gml, expected wkt or None=error) — drawn from the autotest's
# gml_expected_wkt_list, restricted to the engine's 2D model
CASES = [
    ("<gml:Point><gml:coordinates/></gml:Point>", "POINT EMPTY"),
    ("<gml:Point><gml:coordinates>0</gml:coordinates></gml:Point>", None),
    ("<gml:Point><gml:coordinates>0,1</gml:coordinates></gml:Point>", "POINT (0 1)"),
    ("<gml:Point><gml:pos>0</gml:pos></gml:Point>", None),
    ("<gml:Point><gml:pos/></gml:Point>", "POINT EMPTY"),
    ("<gml:Point/>", None),
    ("<gml:Point><foo/></gml:Point>", None),
    ("<gml:LineString/>", None),
    ("<gml:LineString><foo/></gml:LineString>", None),
    (
        "<gml:LineString><gml:posList></gml:posList></gml:LineString>",
        "LINESTRING EMPTY",
    ),
    ("<gml:LineString><gml:posList>0</gml:posList></gml:LineString>", None),
    (
        '<gml:LineString><gml:posList srsDimension="4">0 1 2 3</gml:posList></gml:LineString>',
        None,
    ),
    (
        '<gml:LineString><gml:posList srsDimension="3">0 1 2 3</gml:posList></gml:LineString>',
        None,
    ),
    ("<gml:Point><gml:coord></gml:coord></gml:Point>", None),
    ("<gml:Point><gml:coord><gml:X/><gml:Y/></gml:coord></gml:Point>", None),
    ("<gml:Point><gml:coord><gml:X>0</gml:X></gml:coord></gml:Point>", None),
    ("<gml:Polygon/>", "POLYGON EMPTY"),
    ("<gml:Polygon><gml:outerBoundaryIs/></gml:Polygon>", "POLYGON EMPTY"),
    (
        "<gml:Polygon><gml:outerBoundaryIs><foo/></gml:outerBoundaryIs></gml:Polygon>",
        None,
    ),
    (
        "<gml:LineString><gml:posList>0 1 2 3</gml:posList></gml:LineString>",
        "LINESTRING (0 1,2 3)",
    ),
    (
        "<gml:Polygon><gml:exterior><gml:LinearRing><gml:posList>"
        "0 0 4 0 4 4 0 0</gml:posList></gml:LinearRing></gml:exterior></gml:Polygon>",
        "POLYGON ((0 0,4 0,4 4,0 0))",
    ),
]


@pytest.mark.parametrize("gml,wkt", CASES)
def test_gml_expected_wkt_matrix(gml, wkt):
    # the namespace prefix is stripped by tag matching; ET needs it bound
    gml = gml.replace("<gml:", "<").replace("</gml:", "</")
    if wkt is None:
        with pytest.raises(ValueError):
            gml_to_wkt(gml)
    else:
        assert gml_to_wkt(gml) == wkt


def test_gml_space_test_coordinates():
    # autotest gml_space_test: cs=',' ts=' ' with trailing whitespace
    gml = (
        '<LineString><coordinates decimal="." cs="," ts=" ">'
        "189999.99995605,624999.99998375 200000.00005735,624999.99998375 "
        "200000.00005735,612499.99997125 195791.3593843,612499.99997125 "
        "193327.3749823,612499.99997125 189999.99995605,612499.99997125 "
        "189999.99995605,619462.31247125 189999.99995605,624999.99998375 \n"
        "</coordinates></LineString>"
    )
    kind, pts = parse_wkt_any(gml_to_wkt(gml))
    assert kind == "LINESTRING" and len(pts) == 8


def test_gml_multisurface_and_roundtrip():
    gml = (
        "<MultiSurface><surfaceMember><Polygon><exterior><LinearRing>"
        "<posList>0 0 4 0 4 4 0 0</posList></LinearRing></exterior>"
        "</Polygon></surfaceMember><surfaceMember><Polygon><exterior>"
        "<LinearRing><posList>10 10 14 10 14 14 10 10</posList>"
        "</LinearRing></exterior></Polygon></surfaceMember></MultiSurface>"
    )
    wkt = gml_to_wkt(gml)
    assert wkt.startswith("MULTIPOLYGON") and wkt.count("((") == 2
    # round trip through the GML3 exporter
    gml2 = wkt_to_gml(wkt).replace("gml:", "")
    assert gml_to_wkt(gml2) == wkt
    # point/line/polygon exports round trip too
    for w in ("POINT (1 2)", "LINESTRING (0 0,1 1)",
              "POLYGON ((0 0,4 0,4 4,0 0))"):
        assert gml_to_wkt(wkt_to_gml(w).replace("gml:", "")) == w


def test_gml_curve_segments():
    gml = (
        "<Curve><segments><LineStringSegment><posList>0 0 1 1</posList>"
        "</LineStringSegment><LineStringSegment><posList>1 1 2 0</posList>"
        "</LineStringSegment></segments></Curve>"
    )
    assert gml_to_wkt(gml) == "LINESTRING (0 0,1 1,2 0)"


def test_read_archsites_wfs():
    feats = parse_gml_features(
        open("/root/reference/autotest/ogr/data/gml/archsites.gml", "rb").read()
    )
    assert len(feats) == 1  # the sample file carries one member
    f = feats[0]
    assert f["layer"] == "archsites"
    assert f["fid"] == "archsites.3951"
    assert f["cat"] == "1" and f["str1"] == "Signature Rock"
    assert f["wkt"] == "POINT (593493 4914730)"


def test_read_gml_distributed(spark):
    df = read_gml(
        spark, ["/root/reference/autotest/ogr/data/gml/archsites.gml"]
    )
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0].layer == "archsites"
    assert rows[0].wkt == "POINT (593493 4914730)"
    assert rows[0].fields["str1"] == "Signature Rock"


def test_gml_arc_and_circle_segments():
    """gml:Arc / gml:ArcString / gml:Circle segments linearize on
    ingest (reference: gml2ogrgeometry.cpp -> CircularString ->
    OGRGeometryFactory stroking)."""
    from xml.etree import ElementTree as ET

    from gdal_spark.sources.gml import _parse_geom

    xml = ('<gml:Curve xmlns:gml="http://www.opengis.net/gml/3.2">'
           '<gml:segments>'
           '<gml:Arc><gml:posList>0 0 1 1 2 0</gml:posList></gml:Arc>'
           '<gml:LineStringSegment><gml:posList>2 0 3 0</gml:posList>'
           '</gml:LineStringSegment>'
           '</gml:segments></gml:Curve>')
    kind, pts = _parse_geom(ET.fromstring(xml))
    assert kind == "LINESTRING"
    # semicircle at 4-deg default: 45 segments + straight tail
    assert len(pts) == 47
    assert tuple(pts[0]) == (0, 0) and tuple(pts[-1]) == (3, 0)
    r = np.hypot(pts[:-1, 0] - 1.0, pts[:-1, 1])
    assert np.abs(r - 1.0).max() < 1e-9

    xml2 = ('<gml:Curve xmlns:gml="http://www.opengis.net/gml/3.2">'
            '<gml:segments><gml:Circle>'
            '<gml:posList>0 0 1 1 2 0</gml:posList>'
            '</gml:Circle></gml:segments></gml:Curve>')
    kind, pts = _parse_geom(ET.fromstring(xml2))
    assert bool((pts[0] == pts[-1]).all())
    r = np.hypot(pts[:, 0] - 1.0, pts[:, 1])
    assert np.abs(r - 1.0).max() < 1e-9
