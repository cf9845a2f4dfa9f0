"""PDS4 reader vs the reference autotest (autotest/gdrivers/pds4.py)."""

import os

import pytest

from gdal_spark.functions.checksum import checksum
from gdal_spark.raster.pds4 import pds4_open

D = "/root/reference/autotest/gdrivers/data/pds4"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(D), reason="reference autotest data missing"
)


@pytest.mark.parametrize("name", [
    "byte_pds4_cart_1700.xml", "byte_pds4_cart_1b00.xml",
    "byte_pds4_cart_1d00_1933.xml", "byte_pds4_cart_1g00_1950.xml",
])
def test_pds4_cart_versions(name):
    """test_pds4_read_cart_versions: byte.tif payload (checksum 4672)
    across four cartography schema versions, canonical gt."""
    ds = pds4_open(os.path.join(D, name))
    a = ds.read()
    assert a.shape == (1, 20, 20)
    assert checksum(a[0]) == 4672
    assert ds.geotransform == pytest.approx(
        (-59280.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
    )
    assert ds.projection == "Transverse Mercator"
    assert ds.projection_params["longitude_of_central_meridian"] == -117
    assert ds.projection_params["scale_factor_at_central_meridian"] == \
        pytest.approx(0.9996)
    assert ds.radii["semi_major"] == pytest.approx(6378206.4)
    if name == "byte_pds4_cart_1700.xml":
        assert ds.nodata == 74  # missing_constant (1700 label only)


def test_pds4_oblique_cylindrical():
    """check_pds4_oblique_cylindrical: the axis-swapped geotransform."""
    ds = pds4_open(os.path.join(D, "oblique_cylindrical.xml"))
    assert ds.geotransform == pytest.approx(
        (-3190898.22208, 0, 351.11116, -764017.88416, 351.11116, 0),
        rel=1e-8,
    )
    assert ds.projection == "Oblique Cylindrical"
    assert ds.projection_params["oblique_proj_pole_rotation"] == \
        pytest.approx(158.352054)
    assert ds.radii["semi_major"] == pytest.approx(2575000)


@pytest.mark.parametrize("name,want", [
    ("missing_constant_hexadecimal_float.xml", -3.4028226550889045e38),
    ("missing_constant_hexadecimal_double.xml", -1.7976931348623157e308),
])
def test_pds4_hexadecimal_missing_constant(name, want):
    ds = pds4_open(os.path.join(D, name))
    assert ds.nodata == want


def test_pds4_browse_png():
    """test_pds4_browse_product_png: PNG-backed browse product."""
    ds = pds4_open(os.path.join(D, "M044416018SE_browse.xml"))
    assert (ds.width, ds.height) == (10, 20)
    assert checksum(ds.read()[0]) == 2435
    assert ds.geotransform is None
    assert len(ds.file_list) == 2


def test_pds4_geotiff_backed():
    """test_pds4_browse_product_tiff: BigTIFF payload, header-only
    dimension read, georeferencing from the label."""
    ds = pds4_open(os.path.join(D, "M044416018S_map_raw.xml"))
    assert (ds.width, ds.height) == (26454, 82056)
    assert ds.geotransform is not None
    assert len(ds.file_list) == 2
