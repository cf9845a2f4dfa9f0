"""Arc/Info Binary Grid vs the reference autotest (autotest/gdrivers/aigrid.py)."""

import os

import numpy as np
import pytest

from gdal_spark.functions.checksum import checksum
from gdal_spark.raster import aigrid as AG

AD = "/root/reference/autotest/gdrivers/data/aigrid"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(AD), reason="reference autotest data not present"
)


def _cover(name):
    d = os.path.join(AD, name)
    return {n: open(os.path.join(d, n), "rb").read() for n in os.listdir(d)}


@pytest.mark.parametrize("name", ["abc3x1", "ABC3X1UC"])  # tests 1 and 4
def test_aigrid_checksum(name):
    arr, meta = AG.read_cover(_cover(name))
    band, nodata = AG.as_byte_band(arr, meta)
    assert band.dtype == np.uint8
    assert nodata == 255.0  # test_aigrid_2 nodata expectation
    assert checksum(band.astype(np.int32)) == 3
    # test_aigrid_2 geotransform expectation
    assert meta["gt"] == (-0.5, 1.0, 0.0, 0.5, 0.0, -1.0)


def test_aigrid_colormap():
    # test_aigrid_3: entries 0 and 1 of the 256-entry table
    files = _cover("abc3x1")
    clr = [k for k in files if k.lower().endswith(".clr")][0]
    ct = AG.read_clr(files[clr].decode("ascii", "replace"))
    assert ct.shape == (256, 4)
    assert tuple(ct[0]) == (95, 113, 150, 255)
    assert tuple(ct[1]) == (95, 57, 29, 255)


def test_aigrid_sta_24_bytes():
    # https://trac.osgeo.org/gdal/ticket/6633 LSB 24-byte sta.adf variant
    d = os.path.join(AD, "aigrid_sta_24bytes", "teststa")
    files = {n: open(os.path.join(d, n), "rb").read() for n in os.listdir(d)}
    arr, meta = AG.read_cover(files)
    assert meta["min"] == pytest.approx(0.0)
    assert meta["max"] == pytest.approx(2.0)  # test_aigrid_online stats shape
