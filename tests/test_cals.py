"""CALS + CCITT G4 codec vs the reference autotest
(autotest/gdrivers/cals.py)."""

import os

import numpy as np
import pytest

from gdal_spark.functions.ccitt import g4_decode, g4_encode
from gdal_spark.functions.checksum import checksum
from gdal_spark.functions.tiff import tiff_parse
from gdal_spark.raster.cals import cals_decode, cals_encode

GCORE = "/root/reference/autotest/gcore/data"
HFA = "/root/reference/autotest/gdrivers/data/hfa"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(GCORE), reason="reference autotest data missing"
)


def test_g4_roundtrip_matrix():
    rng = np.random.RandomState(5)
    for shape in [(2, 4), (8, 16), (13, 99), (64, 64)]:
        for density in (0.0, 0.05, 0.5, 0.95, 1.0):
            a = (rng.rand(*shape) < density).astype(np.uint8)
            assert np.array_equal(
                g4_decode(g4_encode(a), shape[1], shape[0]), a)


def test_tiff_1bit_read():
    arr, meta = tiff_parse(
        open(os.path.join(GCORE, "oddsize1bit.tif"), "rb").read())
    assert arr.shape == (99, 99)
    assert checksum(arr) == 5918  # tiff_write.py's own reference value
    assert meta["nbits"] == 1


def test_cals_1_hfa_source():
    from gdal_spark.raster.hfa import open_hfa
    hf = open_hfa(open(os.path.join(HFA, "small1bit.img"), "rb").read())
    arr = hf.read_band(hf.layers()[0])
    back, _ = cals_decode(cals_encode(arr))
    assert checksum(back) == 9907


def test_cals_2_oddsize1bit():
    src, _ = tiff_parse(
        open(os.path.join(GCORE, "oddsize1bit.tif"), "rb").read())
    back, meta = cals_decode(cals_encode(src))
    assert checksum(back) == 3883
    assert meta["color_table"][0] == (0, 0, 0, 255)


def test_cals_3_stable_second_copy():
    src, _ = tiff_parse(
        open(os.path.join(GCORE, "oddsize1bit.tif"), "rb").read())
    first = cals_encode(src)
    arr1, meta1 = cals_decode(first)
    second = cals_encode(arr1, color_table=meta1["color_table"],
                         density=600)
    arr2, meta2 = cals_decode(second)
    assert checksum(arr2) == 3883
    assert meta2["density"] == 600
    assert "pixel_path" not in meta2  # rorient 0,270 stays default
    assert meta2["color_table"][0] == (0, 0, 0, 255)
