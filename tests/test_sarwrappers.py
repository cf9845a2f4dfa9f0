"""RS2 + SAFE wrapper drivers vs the reference autotest
(autotest/gdrivers/rs2.py, safe.py)."""

import os

import pytest

from gdal_spark.functions.checksum import checksum
from gdal_spark.raster.sarwrappers import rs2_open, rs2_rpc, safe_open

R = "/root/reference/autotest/gdrivers/data/rs2"
S = "/root/reference/autotest/gdrivers/data/SAFE_FAKE/test.SAFE"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(R), reason="reference autotest data missing"
)


def _rread(name):
    with open(os.path.join(R, name), "rb") as fh:
        return fh.read()


def _sread(href):
    with open(os.path.join(S, href), "rb") as fh:
        return fh.read()


def _band(arr, i=0):
    return arr if arr.ndim == 2 else arr[:, :, i]


def test_rs2_1():
    arr, meta = rs2_open(_rread("product.xml").decode(), _rread)
    assert checksum(_band(arr)) == 4672
    assert meta["poles"] == ["HH", "HV"]


def test_rs2_2_beta0():
    arr, meta = rs2_open(_rread("product.xml").decode(), _rread,
                         calibration="BETA0")
    assert checksum(_band(arr)) == 4848
    assert meta["calibration"] == "BETA0"


def test_rs2_3_rpc():
    rpc = rs2_rpc(_rread("product.xml").decode())
    assert rpc == {
        "ERR_BIAS": "biasError", "ERR_RAND": "randomError",
        "HEIGHT_OFF": "heightOffset", "HEIGHT_SCALE": "heightScale",
        "LAT_OFF": "latitudeOffset", "LAT_SCALE": "latitudeScale",
        "LINE_DEN_COEFF": "lineDenominatorCoefficients",
        "LINE_NUM_COEFF": "lineNumeratorCoefficients",
        "LINE_OFF": "lineOffset", "LINE_SCALE": "lineScale",
        "LONG_OFF": "longitudeOffset", "LONG_SCALE": "longitudeScale",
        "SAMP_DEN_COEFF": "pixelDenominatorCoefficients",
        "SAMP_NUM_COEFF": "pixelNumeratorCoefficients",
        "SAMP_OFF": "pixelOffset", "SAMP_SCALE": "pixelScale",
    }


def test_safe_1_2():
    arr, meta = safe_open(_sread("manifest.safe").decode(), _sread)
    assert checksum(_band(arr, 0)) == 65372  # IW_VH
    assert checksum(_band(arr, 1)) == 3732   # IW_VV
    assert meta["bands"] == ["IW_VH", "IW_VV"]
    assert meta["FOOTPRINT"] == (
        "POLYGON((-8.407759 38.130520,-11.335915 38.535374,"
        "-11.026125 40.036644,-8.035001 39.633217, -8.407759 38.130520))")


def test_safe_3_4_swath_selection():
    arr, _ = safe_open(_sread("manifest.safe").decode(), _sread,
                       swath="IW_VH")
    assert checksum(_band(arr)) == 65372
    arr, _ = safe_open(_sread("manifest.safe").decode(), _sread,
                       swath="IW_VV")
    assert checksum(_band(arr)) == 3732
