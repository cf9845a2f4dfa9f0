"""DGN v7 driver parity — autotest/ogr/ogr_dgn.py expectations on the
reference's own smalltest.dgn, plus VAX double property tests and
writer roundtrips."""

import struct

import numpy as np

from gdal_spark.sources.dgn import (
    ieee_to_vax,
    read_dgn,
    vax_to_ieee,
    write_dgn,
)

SMALL = "/root/reference/autotest/ogr/data/dgn/smalltest.dgn"


def _coords(wkt):
    import re

    return np.array(
        [float(v) for v in re.findall(r"-?\d+(?:\.\d+)?", wkt)]
    ).reshape(-1, 2)


class TestSmalltest:
    def test_feature_1_text(self):
        """test_ogr_dgn_2: text element, exact LABEL style string."""
        f = read_dgn(open(SMALL, "rb").read())[0]
        assert f["Type"] == 17 and f["Level"] == 1
        assert f["Text"] == "Demo Text"
        c = _coords(f["wkt"])
        assert np.allclose(c, [[0.7365, 4.2198]], atol=1e-8)
        assert f["style"] == (
            'LABEL(t:"Demo Text",c:#ffffff,s:1.000g,f:ENGINEERING)'
        )

    def test_feature_2_circle(self):
        """test_ogr_dgn_3: ellipse stroked to a LINESTRING with the
        expected envelope."""
        f = read_dgn(open(SMALL, "rb").read())[1]
        assert f["Type"] == 15 and f["Level"] == 2
        assert f["wkt"].startswith("LINESTRING")
        c = _coords(f["wkt"])
        assert len(c) >= 15
        assert 0.328593 <= c[:, 0].min() <= 0.328594
        assert 9.68780 <= c[:, 0].max() <= 9.68781
        assert -0.09611 <= c[:, 1].min() <= -0.09610
        assert 9.26310 <= c[:, 1].max() <= 9.26311

    def test_feature_3_filled_shape(self):
        """test_ogr_dgn_4: shape -> POLYGON, exact vertices, BRUSH from
        the SHAPE_FILL attribute linkage."""
        f = read_dgn(open(SMALL, "rb").read())[2]
        assert f["Type"] == 6 and f["Level"] == 2
        assert f["ColorIndex"] == 83
        exp = np.array(
            [[4.5355, 3.317], [4.3832, 2.6517], [4.9441, 2.5235],
             [4.832, 3.3331], [4.5355, 3.317]]
        )
        assert np.allclose(_coords(f["wkt"]), exp, atol=1e-8)
        assert f["style"] == 'BRUSH(fc:#b40000,id:"ogr-brush-0")'

    def test_attribute_filter_type15(self):
        """test_ogr_dgn_5 shape: exactly one type-15 level-2 element."""
        feats = read_dgn(open(SMALL, "rb").read())
        sel = [f for f in feats if f["Type"] == 15 and f["Level"] == 2]
        assert len(sel) == 1


class TestVaxDoubles:
    def test_roundtrip_random(self):
        rng = np.random.default_rng(3)
        for v in rng.uniform(-1e12, 1e12, 500):
            got = vax_to_ieee(ieee_to_vax(float(v)))
            assert got == struct.unpack("<d", struct.pack("<d", v))[0] or \
                abs(got - v) < abs(v) * 1e-15

    def test_zero_and_signs(self):
        assert vax_to_ieee(ieee_to_vax(0.0)) == 0.0
        assert vax_to_ieee(ieee_to_vax(-2.5)) == -2.5


class TestWriter:
    def test_roundtrip_all_kinds(self):
        data = write_dgn(
            [
                dict(type="line", points=[(1.25, 2.5), (3.75, -1.0)],
                     level=2, color=3),
                dict(type="shape", points=[(0, 0), (4, 0), (4, 3), (0, 0)],
                     level=5, color=83),
                dict(type="linestring",
                     points=[(0, 0), (1, 1), (2, 0.5)], level=1),
                dict(type="text", origin=(0.75, 4.25), text="Hello",
                     height=1.0),
            ],
            origin=(-50, -50, 0),
        )
        feats = read_dgn(data)
        assert [f["Type"] for f in feats] == [3, 6, 4, 17]
        assert np.allclose(_coords(feats[0]["wkt"]),
                           [[1.25, 2.5], [3.75, -1.0]])
        assert feats[1]["ColorIndex"] == 83
        assert feats[3]["Text"] == "Hello"
        assert feats[3]["style"].startswith('LABEL(t:"Hello"')
