"""AVCBin (Arc/Info binary coverage) reader vs the reference autotest
(autotest/ogr/ogr_avc.py tests 2, 4, 5) and cross-checked against the
engine's own E00 reader on the equivalent coverages."""

from __future__ import annotations

import os

import pytest

from gdal_spark.sources.avcbin import avcbin_read
from gdal_spark.sources.avce00 import e00_read

D = "/root/reference/autotest/ogr/data/avc"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(D), reason="reference autotest data missing")


def _load(cov: str) -> dict:
    files = {}
    base = os.path.join(D, cov)
    for n in os.listdir(os.path.join(base, cov)):
        with open(os.path.join(base, cov, n), "rb") as fh:
            files[f"cover/{n}"] = fh.read()
    for n in os.listdir(os.path.join(base, "info")):
        with open(os.path.join(base, "info", n), "rb") as fh:
            files[f"info/{n}"] = fh.read()
    return files


def test_testavc_first_arc():
    """test_ogr_avc_2 geometry expectation."""
    d = avcbin_read(_load("testavc"), "testavc")
    arc = d["layers"]["ARC"][0]
    assert arc["wkt"] == ("LINESTRING (340099.875 4100200,"
                          "340400.0625 4100399.5,340900.125 4100200,"
                          "340700.0312 4100199.5)")
    assert len(d["layers"]["ARC"]) == 7
    assert "TESTAVC.BND" in d["tables"]
    assert "TESTAVC.TIC" in d["tables"]


def test_point_coverage_with_pat():
    """test_ogr_avc_4: 80 points, PAT joined, last ids == 80."""
    d = avcbin_read(_load("testpointavc"), "testpointavc")
    lab = d["layers"]["LAB"]
    assert len(lab) == 80
    last = lab[-1]
    assert last["ValueId"] == 80
    assert last["TESTPOINTAVC-ID"] == 80
    # 7 PAT-side attributes on the feature (5 table + ValueId + PolyId)
    assert len([k for k in last if k != "wkt"]) == 7


def test_polygon_coverage():
    """test_ogr_avc_5: 3 PAL features, last ArcIds [-4, -5], AREA."""
    d = avcbin_read(_load("testpolyavc"), "testpolyavc")
    pal = d["layers"]["PAL"]
    assert len(pal) == 3
    last = pal[-1]
    assert last["ArcIds"] == [-4, -5]
    assert last["AREA"] == pytest.approx(9939.059, abs=1e-3)
    assert len([k for k in last if k != "wkt"]) == 5


@pytest.mark.parametrize("cov,e00", [
    ("testpointavc", "testpoint.e00"),
    ("testpolyavc", "testpoly.e00"),
])
def test_binary_matches_e00_twin(cov, e00):
    """Binary and E00 forms of the same coverage decode to the same
    features (geometry WKT + attribute values)."""
    b = avcbin_read(_load(cov), cov)
    with open(os.path.join(D, e00), "rb") as fh:
        t = e00_read(fh.read())
    for layer in b["layers"]:
        if layer not in t["layers"]:
            continue
        bl, tl = b["layers"][layer], t["layers"][layer]
        assert len(bl) == len(tl), layer
        for fb, ft in zip(bl, tl):
            if "wkt" in fb and "wkt" in ft:
                # identical vertices up to float32 print precision
                import re
                nb = [float(v) for v in re.findall(r"-?[\d.]+", fb["wkt"])]
                nt = [float(v) for v in re.findall(r"-?[\d.]+", ft["wkt"])]
                assert len(nb) == len(nt), layer
                for x, y in zip(nb, nt):
                    assert x == pytest.approx(y, abs=0.51), layer
