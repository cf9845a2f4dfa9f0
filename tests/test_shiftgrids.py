"""NTv2 / LOSLAS / NOAA_B shift grids vs the reference autotest
(autotest/gdrivers/ntv2.py, loslas.py, noaa_b.py; geotransforms are
compared with gdaltest's testOpen tolerance (|gt1|+|gt2|)/100)."""

import os

import numpy as np
import pytest

from gdal_spark.functions.checksum import checksum
from gdal_spark.raster.shiftgrids import (
    loslas_decode, noaa_b_decode, ntv2_decode,
)

D = "/root/reference/autotest/gdrivers/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(D + "/ntv2"), reason="reference autotest data missing"
)


def _read(name):
    with open(os.path.join(D, name), "rb") as fh:
        return fh.read()


def _check_gt(got, exp):
    eps = (abs(exp[1]) + abs(exp[2])) / 100.0
    for g, e in zip(got, exp):
        assert abs(g - e) <= eps, (got, exp)


@pytest.mark.parametrize("name", ["test_ntv2_le.gsb", "test_ntv2_be.gsb"])
def test_ntv2(name):
    arr, meta = ntv2_decode(_read("ntv2/" + name))
    assert checksum(arr[:, :, 1]) == 10  # band 2 = longitude shift
    _check_gt(meta["gt"], (-5.52, 7.8, 0.0, 52.05, 0.0, -5.55))
    assert meta["subgrids"] == ["TEST"]


def test_loslas():
    arr, meta = loslas_decode(_read("loslas/wyhpgn.los"))
    _check_gt(meta["gt"], (-111.625, 0.25, 0.0, 45.625, 0.0, -0.25))
    vals = arr.astype(np.float64)
    assert vals.min() == pytest.approx(-0.027868999168276787)
    assert vals.max() == pytest.approx(0.033906999975442886)
    assert vals.mean() == pytest.approx(0.009716129862575248)
    assert vals.std() == pytest.approx(0.008260044951413324)


@pytest.mark.parametrize("name", ["test.b", "test_little_endian.b"])
def test_noaa_b(name):
    arr, meta = noaa_b_decode(_read("noaa_b/" + name))
    assert checksum(arr) == 3
    _check_gt(meta["gt"], (1.75, 0.5, 0.0, 49.25, 0.0, -0.5))


@pytest.mark.parametrize("name", ["g2009u01_le_truncated.bin",
                                  "g2009u01_be_truncated.bin"])
def test_ngsgeoid(name):
    # autotest/gdrivers/ngsgeoid.py: checksum 65534, WGS84, node-registered gt
    from gdal_spark.raster.shiftgrids import ngsgeoid_decode
    arr, meta = ngsgeoid_decode(_read("ngsgeoid/" + name))
    assert arr.shape == (1, 1)
    assert checksum(arr) == 65534
    assert meta["srs"] == "WGS84"
    _check_gt(meta["gt"], (229.99166666666667, 0.016666666666670001, 0.0,
                           40.00833333333334, 0.0, -0.016666666666670001))


def test_ngsgeoid_rejects():
    from gdal_spark.raster.shiftgrids import ngsgeoid_decode
    with pytest.raises(ValueError):
        ngsgeoid_decode(b"\x00" * 44)
    with pytest.raises(ValueError):
        ngsgeoid_decode(b"short")
