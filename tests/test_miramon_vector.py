"""MiraMon vector reader vs the reference autotest
(autotest/ogr/ogr_miramon_vector.py)."""

import os
import re

import pytest

from gdal_spark.sources.miramon_vector import (
    miramon_vector_open,
    read_extended_dbf,
)

D = "/root/reference/autotest/ogr/data/miramon"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(D), reason="reference autotest data missing"
)


def _z(wkt):
    return [float(p.split()[2])
            for p in re.findall(r"[-\d.eE+]+ [-\d.eE+]+ [-\d.eE+]+", wkt)]


def test_simple_points():
    """check_simple_point: WKT-exact coordinates, extended-DBF long
    field names, logical fields."""
    lyr = miramon_vector_open(
        os.path.join(D, "Points/SimplePoints/SimplePointsFile.pnt")
    )
    assert lyr.feature_count == 3
    assert lyr.geom_type == "POINT"
    assert lyr.wkt(0) == "POINT (513.488106565226 848.806850618409)"
    assert lyr.wkt(1) == "POINT (342.325404376834 715.680304471881)"
    assert lyr.wkt(2) == "POINT (594.503182156354 722.692543360232)"
    ftypes = {f["name"]: f["type"] for f in lyr.fields}
    assert ftypes["LOGICALY"] == "L" and ftypes["LOGICALN"] == "L"
    r = lyr.field_record(0)
    assert r["ID_GRAFIC"] == 0 and r["ATT1"] == "A"
    assert r["ATTRIBUTE_2"] == "B"  # extended long field name
    assert r["LOGICALY"] == 1 and r["LOGICALN"] == 0
    r = lyr.field_record(2)
    assert r["ATT1"] == "" and r["ATTRIBUTE_2"] == ""


def test_simple_arcs():
    lyr = miramon_vector_open(
        os.path.join(D, "Arcs/SimpleArcs/SimpleArcFile.arc")
    )
    assert lyr.feature_count == 4
    assert lyr.geom_type == "LINESTRING"
    assert lyr.wkt(0) == (
        "LINESTRING (351.333967649907 610.58039961936,"
        "474.450999048575 824.784015223546,758.721217887776 838.797335870549,"
        "1042.99143672698 610.58039961936,1369.30161750719 562.534728829636)"
    )
    assert lyr.wkt(2) == (
        "LINESTRING (887.843958135159 858.816365366268,"
        "989.941008563323 767.729781160749)"
    )


def test_simple_polygons():
    lyr = miramon_vector_open(
        os.path.join(D, "Polygons/SimplePolygons/SimplePolFile.pol")
    )
    assert lyr.feature_count == 3  # universal polygon excluded
    assert lyr.geom_type == "POLYGON"
    assert lyr.wkt(0) == (
        "POLYGON ((335.318744053333 769.731684110321,"
        "552.525214081877 856.814462416696,775.737392959137 707.672692673594,"
        "648.616555661325 493.469077069408,386.367269267414 498.473834443337,"
        "335.318744053333 769.731684110321))"
    )
    assert lyr.wkt(2) == (
        "POLYGON ((636.605137963894 390.371075166458,"
        "580.551855375883 575.547098001853,723.687916270269 594.565176022785,"
        "796.757373929641 475.451950523261,744.707897240773 396.376784015173,"
        "636.605137963894 390.371075166458))"
    )
    # attributes join by ID_GRAFIC (universal polygon is record 0)
    r = lyr.field_record(0)
    assert r["ID_GRAFIC"] == 1 and r["ATT1"] == "A" and r["ATT2"] == "B"


def test_multipolygon():
    """One MULTIPOLYGON feature: two outer rings, the first with two
    holes; ring roles from the EXTERIOR_ARC_SIDE VFG bit."""
    lyr = miramon_vector_open(
        os.path.join(D, "Polygons/Multipolygons/Multipolygons.pol")
    )
    assert lyr.feature_count == 1
    assert lyr.geom_type == "MULTIPOLYGON"
    w = lyr.wkt(0)
    assert w.startswith(
        "MULTIPOLYGON (((32.699999937575 36.072500062925,"
        "31.959999937575 36.532500062925"
    )
    assert w.endswith(
        "33.599999937575 35.282500062925,34.269999937575 35.602500062925)))"
    )
    assert w.count(")),((") == 1  # two outer polygons
    # first polygon carries two interior rings
    first_poly = w[: w.index(")),((") + 2]
    assert first_poly.count("),(") == 2


def test_3d_points():
    lyr = miramon_vector_open(
        os.path.join(D, "Points/3dpoints/Some3dPoints.pnt")
    )
    assert lyr.feature_count == 32
    assert lyr.geom_type == "POINT25D"
    assert lyr.wkt(0) == "POINT (440551.66 4635315.3 619.9599609375)"


def test_3d_arcs():
    lyr = miramon_vector_open(
        os.path.join(D, "Arcs/3dArcs/linies_3d_WGS84.arc")
    )
    assert lyr.feature_count == 6
    assert lyr.geom_type == "LINESTRING25D"
    assert lyr.epsg == 4326
    assert _z(lyr.wkt(0)) == pytest.approx(
        [595.1063842773438, 326.656005859375, 389.99432373046875,
         716.6224975585938]
    )
    assert _z(lyr.wkt(5)) == pytest.approx(
        [233.82064819335938, 794.5372314453125]
    )


def test_3d_polygons():
    """3D info lives in the arc file for polygon layers."""
    lyr = miramon_vector_open(
        os.path.join(D, "Polygons/3dPolygons/tin_3d.pol")
    )
    assert lyr.feature_count == 5
    assert lyr.geom_type == "POLYGON25D"
    assert _z(lyr.wkt(0)) == pytest.approx(
        [11.223576545715332, 9.221868515014648, 21.929399490356445,
         11.223576545715332]
    )
    assert _z(lyr.wkt(4)) == pytest.approx(
        [18.207277297973633, 21.929399490356445, 5.746463775634766,
         18.207277297973633]
    )


def test_empty_layers():
    import glob

    for sub, ext in (("Points/EmptyPoints", "pnt"),
                     ("Arcs/EmptyArcs", "arc"),
                     ("Polygons/EmptyPolygons", "pol")):
        path = glob.glob(os.path.join(D, sub, f"*.{ext}"))[0]
        lyr = miramon_vector_open(path)
        assert lyr.feature_count == 0


def test_epsg_table():
    from gdal_spark.sources.miramon_vector import _MM_SRS_EPSG

    assert _MM_SRS_EPSG["UTM-31N-ETRS89"] == 25831
    assert _MM_SRS_EPSG["lat/long-WGS84"] == 4326
