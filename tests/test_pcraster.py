"""PCRaster CSF driver vs the reference autotest
(autotest/gdrivers/pcraster.py)."""

import os

import numpy as np
import pytest

from gdal_spark.functions.checksum import checksum
from gdal_spark.raster.pcraster import csf_decode, csf_encode

P = "/root/reference/autotest/gdrivers/data/pcraster/ldd.map"

pytestmark = pytest.mark.skipif(
    not os.path.exists(P), reason="reference autotest data missing"
)


def test_pcraster_1():
    arr, meta = csf_decode(open(P, "rb").read())
    assert checksum(arr) == 4528
    assert meta["value_scale"] == "VS_LDD"


def test_pcraster_2_aux():
    arr, meta = csf_decode(open(P, "rb").read())
    assert meta["gt"] == (182140.0, 10.0, 0.0, 327880.0, 0.0, -10.0)
    assert meta["nodata"] == 255


def test_pcraster_createcopy():
    arr, meta = csf_decode(open(P, "rb").read())
    back, meta2 = csf_decode(csf_encode(arr, meta["gt"], value_scale=0xF0))
    assert checksum(back) == 4528
    assert meta2["gt"] == meta["gt"]
    assert meta2["value_scale"] == "VS_LDD"
    assert np.array_equal(back, arr)


@pytest.mark.parametrize("dtype", [np.uint8, np.int32, np.float32,
                                   np.float64])
def test_pcraster_dtype_roundtrip(dtype):
    rng = np.random.RandomState(11)
    arr = (rng.rand(6, 7) * 50).astype(dtype)
    back, _ = csf_decode(csf_encode(arr, (0, 1, 0, 6, 0, -1)))
    assert np.array_equal(back, arr)
    assert back.dtype == arr.dtype
