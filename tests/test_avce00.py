"""AVCE00 driver vs the reference autotest (autotest/ogr/ogr_avc.py)."""

import os
import re

import pytest

from gdal_spark.sources.avce00 import e00_read

D = "/root/reference/autotest/ogr/data/avc"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(D), reason="reference autotest data missing"
)


def _read(name):
    with open(os.path.join(D, name), "rb") as fh:
        return fh.read()


def test_avc_1_e00():
    cov = e00_read(_read("test.e00"))
    assert cov["prj"]  # SRS present
    arcs = cov["layers"]["ARC"]
    assert [a["UserID"] for a in arcs] == ["1", "2", "3", "4", "5", "6",
                                           "7"]
    pts = [tuple(float(t) for t in pair.split()) for pair in
           re.findall(r"-?[\d.]+ -?[\d.]+", arcs[0]["wkt"])]
    expected = [(340099.875, 4100200.0), (340400.0625, 4100399.5),
                (340900.125, 4100200.0), (340700.03125, 4100199.5)]
    assert len(pts) == len(expected)
    for a, b in zip(pts, expected):
        assert abs(a[0] - b[0]) <= 0.01 and abs(a[1] - b[1]) <= 0.01


def test_avc_3_compressed_rejected():
    with pytest.raises(ValueError):
        e00_read(_read("compressed.e00"))


def test_avc_4_points():
    cov = e00_read(_read("testpoint.e00"))
    labs = cov["layers"]["LAB"]
    assert len(labs) == 80
    last = labs[-1]
    # 7 fields like the reference layer (ValueId, PolyId + 5 PAT)
    assert len([k for k in last if k != "wkt"]) == 7
    assert last["ValueId"] == 80
    assert last["WELLS-ID"] == 80


def test_avc_5_polygons():
    cov = e00_read(_read("testpoly.e00"))
    pals = cov["layers"]["PAL"]
    assert len(pals) == 3
    last = pals[-1]
    assert len([k for k in last if k != "wkt"]) == 5
    assert last["ArcIds"] == [-4, -5]
    assert last["AREA"] == pytest.approx(9939.059, abs=1e-3)
