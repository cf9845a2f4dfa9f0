"""FITS driver vs the reference autotest (autotest/gdrivers/fits.py)."""

import os

import numpy as np
import pytest

from gdal_spark.functions.checksum import checksum
from gdal_spark.raster.fits import fits_decode, fits_encode

FD = "/root/reference/autotest/gdrivers/data/fits"
GCORE = "/root/reference/autotest/gcore/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(FD), reason="reference autotest data not present"
)


def _read(path):
    with open(path, "rb") as fh:
        return fh.read()


@pytest.mark.parametrize(
    "fname", ["byte", "int16", "int32", "uint16", "uint32",
              "float32", "float64"],
)
def test_fits_createcopy_roundtrip(fname):
    from gdal_spark.functions.tiff import tiff_parse
    src, _ = tiff_parse(_read(os.path.join(GCORE, fname + ".tif")))
    back, meta = fits_decode(fits_encode(src))
    assert np.array_equal(back, src)
    assert back.dtype == src.dtype
    assert checksum(back) == checksum(src)


def test_fits_nodata_roundtrip():
    arr = np.zeros((4, 4), np.uint8)
    _, meta = fits_decode(fits_encode(arr, nodata=0))
    assert meta["nodata"] == 0


def test_fits_offscale_roundtrip():
    arr = np.zeros((4, 4), np.uint8)
    _, meta = fits_decode(fits_encode(
        arr, offset=-0.0039525691699605, scale=1.00395256917))
    assert meta["offset"] == -0.0039525691699605
    assert meta["scale"] == 1.00395256917


def test_fits_read_offset_scale_no_georef():
    _, meta = fits_decode(_read(os.path.join(
        FD, "offset_scale_no_georef.fits")))
    assert meta["offset"] != 0
    assert meta["scale"] != 1
    assert "gt" not in meta


def test_fits_read_georef_merc():
    arr, meta = fits_decode(_read(os.path.join(FD, "byte_merc.fits")))
    assert arr.shape == (20, 20)
    assert meta["gt"] == pytest.approx(
        (-13095897.481058259, 72.23522015778646, 0.0,
         3991653.2130816197, 0.0, -72.23522015778646), abs=1e-3)
    assert meta["nodata"] == -9999.0


def test_fits_read_empty_primary_hdu():
    with pytest.raises(ValueError):
        fits_decode(_read(os.path.join(FD, "empty_primary_hdu.fits")))


def test_fits_read_image_in_second_hdu():
    arr, meta = fits_decode(_read(os.path.join(FD, "image_in_second_hdu.fits")))
    assert arr.shape == (2, 1)
    assert meta["metadata"] == {
        "BAR": "BAZ     ",
        "FOO": "BAR_override",
        "FOO2": "BAR2    ",
    }


def test_fits_read_image_in_first_and_second_hdu():
    raw = _read(os.path.join(FD, "image_in_first_and_second_hdu.fits"))
    arr1, meta1 = fits_decode(raw)           # first image HDU: 1x2
    assert arr1.shape == (2, 1)
    assert meta1["n_hdus"] == 2
    arr2, _ = fits_decode(raw, hdu=2)        # second image HDU: 1x3
    assert arr2.shape == (3, 1)


def test_fits_image_after_table_hdu():
    raw = _read(os.path.join(
        FD, "image_in_second_and_fourth_hdu_table_in_third.fits"))
    arr, meta = fits_decode(raw)
    assert arr.ndim == 2
    assert meta["n_hdus"] == 4


def test_fits_bottom_up_rows():
    arr = np.array([[1, 2], [3, 4]], np.uint8)
    raw = fits_encode(arr)
    # the data unit stores the bottom row first
    dstart = raw.index(b"END") // 2880 * 2880 + 2880
    assert raw[dstart:dstart + 4] == bytes([3, 4, 1, 2])
    back, _ = fits_decode(raw)
    assert np.array_equal(back, arr)


def test_fits_multiband_bsq():
    arr = np.arange(24, dtype=np.int16).reshape(2, 3, 4)
    back, _ = fits_decode(fits_encode(arr))
    assert np.array_equal(back, arr)
