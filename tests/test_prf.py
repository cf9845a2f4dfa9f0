"""PHOTOMOD PRF / x-dem driver vs the reference autotest
(autotest/gdrivers/prf.py)."""

import os

import numpy as np
import pytest

from gdal_spark.functions.checksum import checksum
from gdal_spark.raster.prf import prf_open

D = "/root/reference/autotest/gdrivers/data/PRF"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(D), reason="reference autotest data missing"
)


def test_prf_megatiff():
    """test_prf_1: LZW tile mosaic, checksum 43190, GeoRef affine with
    the PH_GEOREF_SHIFT_Y row correction -> gt (1,2,3,-7,5,6)."""
    ds = prf_open(os.path.join(D, "ph.prf"))
    assert (ds.width, ds.height, ds.nbands) == (201, 268, 1)
    assert ds.dtype == np.dtype(np.uint16)
    assert ds.geotransform == (1.0, 2.0, 3.0, -7.0, 5.0, 6.0)
    assert checksum(ds.read(1)) == 43190  # reference: 43190
    assert len(ds.overviews) == 0  # test_prf_3


def test_prf_xdem():
    """test_prf_2/4: x-dem extents -> pixel-is-point gt, meters unit,
    one pyramid overview 1082x1165, sourceless-VRT tiles -> zeros."""
    ds = prf_open(os.path.join(D, "dem.x-dem"))
    assert (ds.width, ds.height) == (4330, 4663)
    assert ds.dtype == np.dtype(np.float32)
    assert ds.unit_type == "m"
    assert ds.geotransform == (1.5, 1.0, 0.0, 9329.0, 0.0, -2.0)
    assert len(ds.overviews) == 1
    assert ds.overview_size(0) == (1082, 1165)
    assert checksum(ds.read(1)) == 0
    assert ds.statistics == (5.0, 6.0)
    assert ds.nodata == -1111111.0


def test_prf_identify():
    from gdal_spark.sources.identify import identify_driver

    h = open(os.path.join(D, "ph.prf"), "rb").read(1024)
    assert identify_driver(h, "ph.prf") == "PRF"
    h = open(os.path.join(D, "dem.x-dem"), "rb").read(1024)
    assert identify_driver(h, "dem.x-dem") == "PRF"
