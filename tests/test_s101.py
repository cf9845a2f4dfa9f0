"""S-101 ENC reader vs the reference autotest fixtures
(autotest/ogr/data/s101/*, expectations from autotest/ogr/ogr_s101.py
and the reader sources)."""

from __future__ import annotations

import os

import pytest

from gdal_spark.sources.s101 import s101_open

D = "/root/reference/autotest/ogr/data/s101"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(D), reason="reference autotest data missing")


def _rd(name: str) -> bytes:
    with open(os.path.join(D, name), "rb") as fh:
        return fh.read()


def test_minimal_metadata():
    """test_ogr_s101_read_minimal: exact metadata dict."""
    ds = s101_open(_rd("minimal.000"))
    assert ds.metadata == {
        "APPLICATION_PROFILE": "1",
        "DATASET_EDITION": "10.0",
        "DATASET_IDENTIFIER": "file name",
        "DATASET_LANGUAGE": "EN",
        "DATASET_REFERENCE_DATE": "20260401",
        "DATASET_TITLE": "dataset title",
        "ENCODING_SPECIFICATION": "S-100 Part 10a",
        "ENCODING_SPECIFICATION_EDITION": "5.2",
        "PRODUCT_EDITION": "2.0",
        "PRODUCT_IDENTIFIER": "INT.IHO.S-101.2.0",
        "STATUS": "VALID",
    }
    assert ds.features == []


def test_points():
    ds = s101_open(_rd("point.000"))
    assert ds.epsg == 4326
    assert ds.points[1] == (2.0, 49.0)
    # 3-D point: z divided by CMFZ (10)
    assert ds.points[2] == (2.5, 49.5, 15.5)
    assert ds.points[3] == (-2.5, -49.5, -15.5)
    # attribute catalogue decoded from ATCS
    assert ds.attr_names[8] == "text"
    assert ds.information_types[1]["attributes"][0]["name"] == "text"
    assert ds.information_types[1]["attributes"][0]["value"] == "my text"


def test_multipoints():
    ds = s101_open(_rd("multipoint.000"))
    assert ds.multipoints[1] == [(2.0, 49.0), (3.0, 48.0)]
    assert ds.multipoints[2] == [(2.5, 49.5, 15.5), (3.5, 48.5, -15.5)]
    assert ds.multipoints[4] == [(2.5, 49.5)]


def test_curves():
    ds = s101_open(_rd("curve.000"))
    assert ds.curves[1].tolist() == [[2.0, 49.0], [2.5, 49.5], [3.0, 50.0]]
    # closed ring curve
    assert ds.curves[2][0].tolist() == ds.curves[2][-1].tolist()


def test_composite_curves():
    ds = s101_open(_rd("compositecurve.000"))
    # CCID 1 = curve 1 + curve 2 forward, joined without duplicate vertex
    c1 = ds.resolve_curve(125, 1)
    assert c1.tolist() == [
        [2.0, 49.0], [3.0, 49.0], [3.0, 50.0], [2.0, 50.0], [2.0, 49.0]]
    # CCID 2 = both reversed in reverse order -> the reverse path
    c2 = ds.resolve_curve(125, 2)
    assert c2.tolist() == c1[::-1].tolist()
    # CCID 4 references another composite curve (recursion)
    c4 = ds.resolve_curve(125, 4)
    assert c4.tolist() == ds.resolve_curve(125, 3).tolist()


def test_surface_rings():
    ds = s101_open(_rd("surface.000"))
    rings = ds.surface_rings(1)
    assert len(rings) == 2
    # exterior: curve 1 reversed (ORNT 2)
    assert rings[0][0].tolist() == [2.0, 49.0]
    assert rings[0][1].tolist() == [2.0, 50.0]
    # interior ring comes from composite curve 1
    assert rings[1][0].tolist() == [2.01, 49.1]


def test_feature_geometries():
    ds = s101_open(_rd("feature.000"))
    feats = {f["foid"][1]: f for f in ds.features}
    g = ds.feature_geometry
    assert g(feats[11]) is None  # no spatial association
    assert g(feats[22]) == "POINT (2 49)"
    assert g(feats[33]) == "MULTIPOINT ((2 49), (2.01 49.1))"
    assert g(feats[77]).startswith("LINESTRING (2 49, 3 49")
    # reversed orientation curve
    assert g(feats[88]).startswith("LINESTRING (2 49, 2 50")
    assert g(feats[110]).startswith("POLYGON ((2 49, 2 50")
    assert g(feats[120]).startswith("MULTIPOLYGON")
    # feature attributes via the ATCS catalogue
    assert feats[11]["attributes"][0]["name"] == "text"
    assert feats[11]["attributes"][0]["value"] == "my text ATTR"
    assert feats[11]["foid"] == (12345, 11, 1)


def test_point_updates():
    """RUIN semantics: insert / delete / modify from .001 update."""
    ds = s101_open(_rd("point_2d_update.000"),
                   [_rd("point_2d_update.001")])
    assert sorted(ds.points) == [1, 3, 4, 5]
    assert ds.points[3] == (3.0, 30.0)   # modified
    assert ds.points[4] == (4.0, 40.0)   # inserted


def test_cancelled_dataset():
    ds = s101_open(_rd("cancelled.000"), [_rd("cancelled.001")])
    assert ds.metadata["STATUS"] == "CANCELLED"
    # without the update it is valid
    assert s101_open(_rd("cancelled.000")).metadata["STATUS"] == "VALID"


def test_update_cannot_open_directly():
    with pytest.raises(ValueError, match="APPLICATION_PROFILE=2"):
        s101_open(_rd("cancelled.001"))


def test_multipoint_updates():
    ds = s101_open(_rd("multipoint_2d_update.000"),
                   [_rd("multipoint_2d_update.001")])
    assert len(ds.multipoints) > 0


def test_surface_update():
    ds0 = s101_open(_rd("surface_update.000"))
    ds1 = s101_open(_rd("surface_update.000"), [_rd("surface_update.001")])
    # the update changes the surface record set somehow; both must parse
    assert ds0.surfaces and ds1.surfaces


def test_rejects_non_s101():
    with pytest.raises(Exception):
        s101_open(b"garbage not iso8211")
