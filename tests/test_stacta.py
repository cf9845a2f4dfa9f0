"""STACTA driver vs the reference autotest (autotest/gdrivers/stacta.py)."""

import os

import numpy as np
import pytest

from gdal_spark.functions.tiff import tiff_parse
from gdal_spark.raster.stacta import stacta_open

BASE = "/root/reference/autotest/gdrivers/data/stacta/"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(BASE), reason="reference autotest data missing"
)


def _read(href):
    with open(BASE + href, "rb") as fh:
        return fh.read()


def test_stacta_basic():
    arr, meta = stacta_open(_read("test.json"), _read)
    assert arr.shape == (1024, 2048, 3)
    assert meta["gt"] == pytest.approx(
        (-180.0, 0.17578125, 0.0, 90.0, 0.0, -0.17578125), rel=1e-8)
    assert meta["nodata"] == 0.0
    assert meta["zooms"] == [0, 1, 2]  # two overview levels below zoom 2
    # pixels match the two max-zoom tiles mosaicked side by side
    t0, _ = tiff_parse(_read("WorldCRS84Quad/2/0/0.tif"))
    t1, _ = tiff_parse(_read("WorldCRS84Quad/2/0/1.tif"))
    assert np.array_equal(arr, np.concatenate([t0, t1], axis=1))


def test_stacta_overview_zoom():
    arr, meta = stacta_open(_read("test.json"), _read, zoom=1)
    assert arr.shape[2] == 3
    assert meta["zoom"] == 1
    t, _ = tiff_parse(_read("WorldCRS84Quad/1/0/0.tif"))
    assert np.array_equal(arr, t)


def test_stacta_east_hemisphere():
    arr, meta = stacta_open(_read("test_east_hemisphere.json"), _read)
    assert meta["gt"][0] >= -180.0
    assert arr.size > 0
