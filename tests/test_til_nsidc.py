"""TIL + NSIDCbin drivers vs the reference autotest
(autotest/gdrivers/til.py, nsidcbin.py)."""

import os

import numpy as np
import pytest

from gdal_spark.functions.checksum import checksum
from gdal_spark.raster.tilfmt import (
    imd_imagery_metadata, nsidcbin_decode, til_decode,
)

D = "/root/reference/autotest/gdrivers/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(D + "/til"), reason="reference autotest data missing"
)


def _read_case_insensitive(name):
    base = os.path.join(D, "til")
    for cand in os.listdir(base):
        if cand.lower() == name.lower():
            with open(os.path.join(base, cand), "rb") as fh:
                return fh.read()
    raise FileNotFoundError(name)


def test_til_1():
    arr, meta = til_decode(
        _read_case_insensitive("testtil.til").decode(),
        _read_case_insensitive,
        imd_text=_read_case_insensitive("testtil.imd").decode())
    assert checksum(arr) == 4672
    assert meta["n_tiles"] == 1


def test_til_2_imd_imagery():
    md = imd_imagery_metadata(_read_case_insensitive("testtil.imd").decode())
    assert md["SATELLITEID"] == "WV03"
    assert md["CLOUDCOVER"] == "0.027"
    assert md["ACQUISITIONDATETIME"] == "2015-01-01T00:00:00.000000Z"


def test_til_3_xml():
    arr, meta = til_decode(
        _read_case_insensitive("testtil2.xml").decode(),
        _read_case_insensitive)
    assert checksum(arr) == 4672
    md = meta["imagery"]
    assert md["SATELLITEID"] == "WV03"
    assert "CLOUDCOVER" in md
    assert "ACQUISITIONDATETIME" in md


def test_nsidcbin_1():
    raw = open(os.path.join(
        D, "nsidcbin/nt_20220409_f18_nrt_s.bin"), "rb").read()
    arr, meta = nsidcbin_decode(raw)
    assert arr.shape[1] == 316
    assert arr.dtype == np.uint8
    assert int(arr[44, 60]) == 27
    assert meta["south"]
