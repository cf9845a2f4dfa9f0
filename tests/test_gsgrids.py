"""Golden Software grids vs the reference autotest
(autotest/gdrivers/gsg.py)."""

import os

import numpy as np
import pytest

from gdal_spark.functions.checksum import checksum
from gdal_spark.raster.gsgrids import (
    gs7bg_decode, gs7bg_encode, gsag_decode, gsag_encode,
    gsbg_decode, gsbg_encode,
)

GD = "/root/reference/autotest/gdrivers/data/gsg"
EXPECTED_GT = (440720, 60, 0, 3751320, 0, -60)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(GD), reason="reference autotest data not present"
)


def _read(name):
    with open(os.path.join(GD, name), "rb") as fh:
        return fh.read()


def test_gsg_1_binary():
    arr, meta = gsbg_decode(_read("gsg_binary.grd"))
    assert checksum(arr) == 4672
    assert meta["gt"] == pytest.approx(EXPECTED_GT)


def test_gsg_2_ascii():
    arr, meta = gsag_decode(_read("gsg_ascii.grd"))
    assert checksum(arr) == 4672
    assert meta["gt"] == pytest.approx(EXPECTED_GT)


def test_gsg_3_surfer7():
    arr, meta = gs7bg_decode(_read("gsg_7binary.grd"))
    assert checksum(arr) == 4672
    assert meta["gt"] == pytest.approx(EXPECTED_GT)


def test_gsg_createcopy_roundtrips():
    src, meta = gsbg_decode(_read("gsg_binary.grd"))
    for enc, dec in ((gsbg_encode, gsbg_decode),
                     (gs7bg_encode, gs7bg_decode)):
        back, m2 = dec(enc(src, meta["gt"]))
        assert checksum(back) == 4672
        assert m2["gt"] == pytest.approx(EXPECTED_GT)
    back, m2 = gsag_decode(gsag_encode(src, meta["gt"]).encode())
    assert checksum(back) == 4672
    assert m2["gt"] == pytest.approx(EXPECTED_GT)
