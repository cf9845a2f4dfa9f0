"""SXF reader vs the reference autotest (autotest/ogr/ogr_sxf.py)."""

import os
import tempfile

import pytest

from gdal_spark.sources.sxf import sxf_open

SXF = "/root/reference/autotest/ogr/data/sxf/100_test.sxf"
RSC = "/root/reference/ogr/ogrsf_frmts/sxf/data/default.rsc"

pytestmark = pytest.mark.skipif(
    not os.path.exists(SXF), reason="reference autotest data missing"
)


def test_sxf_open():
    ds = sxf_open(SXF, rsc_path=RSC)
    assert ds.passport.version == 4
    assert ds.passport.scale == 100000
    assert ds.metadata["SCALE"] == "1 : 100000"
    assert ds.layer_count == 9
    total = sum(lyr.feature_count for lyr in ds.layers)
    assert total == 78


def test_sxf_layer_fullnames():
    """test_ogr_sxf_4: SXF_LAYER_FULLNAME=YES exposes the CP1251
    Russian layer names from the default classificator."""
    ds = sxf_open(SXF, rsc_path=RSC, layer_fullname=True)
    assert ds.layer_names() == [
        "СИСТЕМНЫЙ", "ВОДНЫЕ ОБЪЕКТЫ", "НАСЕЛЕННЫЕ ПУНКТЫ",
        "ИНФРАСТРУКТУРА", "ЗЕМЛЕПОЛЬЗОВАНИЕ", "РЕЛЬЕФ СУШИ",
        "ГИДРОГРАФИЯ (РЕЛЬЕФ)", "МАТЕМАТИЧЕСКАЯ ОСНОВА", "Not_Classified",
    ]


def test_sxf_custom_rsc():
    """test_ogr_sxf_3: an empty custom RSC falls back to the default
    SYSTEM + Not_Classified layer pair."""
    with tempfile.NamedTemporaryFile(suffix=".rsc") as fake:
        ds = sxf_open(SXF, rsc_path=fake.name)
        assert ds.layer_names() == ["SYSTEM", "Not_Classified"]


@pytest.mark.parametrize("attr_type", [0, 126, 127])
def test_sxf_attribute_length_overflow(attr_type):
    """An attribute length byte of 0xFF must not wrap: the unsigned
    interpretation keeps the bounds check effective."""
    data = bytearray(open(SXF, "rb").read())
    data[744] = attr_type
    data[745] = 0xFF
    with tempfile.NamedTemporaryFile(suffix=".sxf", delete=False) as f:
        f.write(data)
        path = f.name
    try:
        ds = sxf_open(path, rsc_path=RSC)
        assert sum(lyr.feature_count for lyr in ds.layers) == 78
    finally:
        os.unlink(path)


def test_sxf_features():
    """Geometry decode (projected coordinates from the frame origin +
    scale/resolution coefficient), CP1251 text labels and SC_ semantic
    attributes."""
    ds = sxf_open(SXF, rsc_path=RSC)
    kinds = {}
    for lyr in ds.layers:
        for f in lyr.features:
            kinds[f.geom_type] = kinds.get(f.geom_type, 0) + 1
    assert kinds == {"line": 33, "polygon": 14, "point": 11,
                     "vectorangle": 15, "text": 5}
    texts = [f.text for lyr in ds.layers for f in lyr.features if f.text]
    assert "Река" in texts and "Город(sity)" in texts
    water = next(lyr for lyr in ds.layers if lyr.name == "water")
    named = [f.attributes.get("SC_9") for f in water.features
             if "SC_9" in f.attributes]
    assert "Глубокое" in named
    # all coordinates inside the Gauss-Krueger zone-prefixed envelope
    for lyr in ds.layers:
        for f in lyr.features:
            for x, y, _ in f.geometry:
                assert 10.2e6 < x < 10.4e6 and 6.1e6 < y < 6.3e6
