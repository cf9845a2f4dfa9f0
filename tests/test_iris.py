"""IRIS weather-radar driver vs the reference autotest
(autotest/gdrivers/iris.py)."""

import os

import pytest

from gdal_spark.functions.checksum import checksum
from gdal_spark.raster.iris import iris_decode

D = "/root/reference/autotest/gdrivers/data/iris"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(D), reason="reference autotest data missing"
)


def _band1(arr):
    return arr if arr.ndim == 2 else arr[:, :, 0]


def test_iris_1():
    arr, _ = iris_decode(open(os.path.join(D, "fakeiris.dat"), "rb").read())
    assert checksum(_band1(arr)) == 65532


def test_iris_2():
    arr, meta = iris_decode(open(os.path.join(D, "iristest.dat"),
                                 "rb").read())
    assert checksum(_band1(arr)) == 52872

    expected_gt = [16435.721785269096, 1370.4263720754534, 0.0,
                   5289830.4584420761, 0.0, -1357.6498705837876]
    for g, e in zip(meta["gt"], expected_gt):
        if e == 0.0:
            assert g == 0.0
        else:
            assert abs(g - e) / abs(e) <= 1e-5

    expected_md = {
        "AZIMUTH_SMOOTHING_FOR_SHEAR": "0.0",
        "CAPPI_BOTTOM_HEIGHT": "1000.0 m",
        "COMPOSITED_PRODUCT": "YES",
        "COMPOSITED_PRODUCT_MASK": "0x0000080c",
        "DATA_TYPE": "Clutter Corrected H reflectivity (1 byte)",
        "DATA_TYPE_CODE": "dBZ",
        "DATA_TYPE_INPUT": "Clutter Corrected H reflectivity (1 byte)",
        "DATA_TYPE_INPUT_CODE": "dBZ",
        "DATA_TYPE_UNITS": "dBZ",
        "GROUND_HEIGHT": "523 m",
        "INGEST_HARDWARE_NAME": "composada       ",
        "INGEST_SITE_IRIS_VERSION": "8.12",
        "INGEST_SITE_NAME": "composada       ",
        "MAX_AGE_FOR_SHEAR_VVP_CORRECTION": "600 s",
        "NYQUIST_VELOCITY": "6.00 m/s",
        "PRF": "450 Hz",
        "PRODUCT": "CAPPI",
        "PRODUCT_CONFIGURATION_NAME": "CAPPI250CAT ",
        "PRODUCT_ID": "3",
        "PRODUCT_SITE_IRIS_VERSION": "8.12",
        "PRODUCT_SITE_NAME": "SMCXRADSRV01    ",
        "RADAR_HEIGHT": "542 m",
        "TASK_NAME": "PPIVOL_A    ",
        "TIME_INPUT_INGEST_SWEEP": "2012-04-19 14:48:05",
        "TIME_PRODUCT_GENERATED": "2012-04-19 14:48:30",
        "WAVELENGTH": "5.33 cm",
    }
    for k, v in expected_md.items():
        assert meta["metadata"].get(k) == v, (k, meta["metadata"].get(k))
    assert meta["projection"] == "Mercator"
