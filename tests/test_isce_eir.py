"""ISCE + EIR drivers vs the reference autotest
(autotest/gdrivers/isce.py, eir.py)."""

import os

import numpy as np
import pytest

from gdal_spark.functions.checksum import checksum
from gdal_spark.raster.isce_eir import eir_decode, isce_decode, isce_encode

D = "/root/reference/autotest/gdrivers/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(D + "/isce"), reason="reference autotest data missing"
)


def _cs(arr):
    if np.iscomplexobj(arr):
        inter = np.empty((arr.shape[0], arr.shape[1] * 2))
        inter[:, 0::2] = arr.real
        inter[:, 1::2] = arr.imag
        return checksum(inter)
    return checksum(arr)


def test_isce_1():
    xml = open(D + "/isce/isce.slc.xml").read()
    raw = open(D + "/isce/isce.slc", "rb").read()
    arr, meta = isce_decode(raw, xml)
    assert arr.shape == (10, 12)
    assert arr.dtype == np.complex64
    assert _cs(arr) == 350
    assert meta["gt"] == pytest.approx(
        (14.259166666666667, 0.0008333333333333334, 0.0,
         38.22083333333333, 0.0, -0.0008333333333333334))
    assert meta["metadata"]["IMAGE_TYPE"] == "slc"


def test_isce_3_roundtrip():
    xml = open(D + "/isce/isce.slc.xml").read()
    raw = open(D + "/isce/isce.slc", "rb").read()
    arr, meta = isce_decode(raw, xml)
    body, xml2 = isce_encode(arr, gt=meta["gt"])
    back, meta2 = isce_decode(body, xml2)
    assert np.array_equal(back, arr)
    assert _cs(back) == 350
    assert meta2["gt"] == pytest.approx(meta["gt"])


def test_eir_1():
    hdr = open(D + "/eir/fakeeir.hdr").read()
    raw = open(D + "/eir/fakeeir.img", "rb").read()
    arr, meta = eir_decode(hdr, raw)
    assert checksum(arr) == 1
    assert meta["pixel_files"] == "fakeeir.img"
