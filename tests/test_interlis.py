"""Interlis 1 reader vs the reference autotest fixtures
(autotest/ogr/ogr_ili.py, data/ili)."""

from __future__ import annotations

import os

import pytest

from gdal_spark.sources.interlis import imd_parse, itf_read

D = "/root/reference/autotest/ogr/data/ili"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(D), reason="reference autotest data missing")


def _read(name: str) -> str:
    with open(os.path.join(D, name)) as fh:
        return fh.read()


@pytest.fixture(scope="module")
def layers():
    return itf_read(_read("Beispiel.itf"), _read("Beispiel.imd"))


def test_layer_list(layers):
    """test_ogr_interlis1_2 layer enumeration."""
    assert sorted(layers) == [
        "Bodenbedeckung__BoFlaechen",
        "Bodenbedeckung__BoFlaechen_Form",
        "Bodenbedeckung__Gebaeude",
        "Bodenbedeckung__Strasse",
    ]


def test_boflaechen_fields(layers):
    """test_ogr_interlis1_2: 3 features; 2nd = [20, 1, 168.27, 170.85]."""
    bo = layers["Bodenbedeckung__BoFlaechen"]
    assert len(bo) == 3
    f = bo[1]["fields"]
    assert [f["_TID"], f["Art"], f["Form_ref_0"], f["Form_ref_1"]] == \
        ["20", 1, 168.27, 170.85]


def test_area_polygonization(layers):
    """test_ogr_interlis1_10: first feature's assembled polygon and
    reference point."""
    f = layers["Bodenbedeckung__BoFlaechen"][0]
    assert f["geoms"]["Form"] == ("Point", (148.2, 183.48))
    kind, rings = f["geoms"]["Form_poly"]
    assert kind == "Polygon"
    assert rings[0] == [
        (146.92, 174.98), (138.68, 187.51), (147.04, 193.0),
        (149.79, 188.82), (158.15, 194.31), (163.64, 185.96),
        (146.92, 174.98)]


def test_gebaeude_point_and_fields(layers):
    """test_ogr_interlis1_9 values: AssNr 958, role ref 10,
    POINT (148.41 175.96)."""
    g = layers["Bodenbedeckung__Gebaeude"][0]
    assert g["fields"]["AssNr"] == "958"
    assert g["fields"]["_Ref0"] == "10"
    assert g["geoms"]["PositionHauseingang"] == (
        "Point", (148.41, 175.96))


def test_strasse_arc_interpolation(layers):
    s = layers["Bodenbedeckung__Strasse"][0]
    kind, pts = s["geoms"]["Achse"]
    assert kind == "LineString"
    assert pts[0] == (190.26, 208.0)
    assert pts[-1] == (141.08, 152.94)
    # the ARCP segment interpolates more than the raw 4 vertices
    assert len(pts) > 10
    # interpolated points stay on the arc's circle through the ARCP pt
    import math
    p0, pm = (190.26, 208.0), (187.0, 186.0)
    # all interpolated points between p0 and the LIPT after the arc
    # share the circumcircle radius
    ax, ay = p0
    bx, by = pm
    cx, cy = (173.10, 171.0)
    d = 2 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
    ux = ((ax**2 + ay**2) * (by - cy) + (bx**2 + by**2) * (cy - ay)
          + (cx**2 + cy**2) * (ay - by)) / d
    uy = ((ax**2 + ay**2) * (cx - bx) + (bx**2 + by**2) * (ax - cx)
          + (cx**2 + cy**2) * (bx - ax)) / d
    r = math.hypot(ax - ux, ay - uy)
    for x, y in pts[1:5]:
        assert math.hypot(x - ux, y - uy) == pytest.approx(r, abs=1e-6)


def test_helper_table_lines(layers):
    form = layers["Bodenbedeckung__BoFlaechen_Form"]
    assert len(form) == 4
    assert form[0]["geoms"]["_Geom"][0] == "LineString"


def test_multigeom_model():
    """test_ogr_interlis1_11: two geometry columns."""
    layers = itf_read(_read("multigeom.itf"), _read("multigeom.imd"))
    lyr = layers["MultigeomTests__MultigeomTable"]
    assert len(lyr) == 1
    f = lyr[0]
    assert "GeomLine" in f["geoms"] or "GeomPoint" in f["geoms"]
    assert f["fields"].get("GeomPoint_0") == 148.41
    assert f["fields"].get("GeomPoint_1") == 175.96


def test_model_attr_kinds():
    m = imd_parse(_read("Beispiel.imd"))
    cls = m["Beispiel.Bodenbedeckung.BoFlaechen"]
    assert cls["attrs"] == [("Art", "enum"), ("Form", "area")]
    cls2 = m["Beispiel.Bodenbedeckung.Strasse"]
    assert cls2["attrs"] == [("Achse", "polyline")]
