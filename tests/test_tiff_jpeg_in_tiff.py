"""COMPRESSION_JPEG (7) and LZMA (34925) TIFF reads, pinned against the
reference autotest's OWN expected checksums where it states them:

  * byte_jpg_tablesmodezero.tif -> 4743 (gcore/tiff_write.py:5936)
  * byte_jpg_unusual_jpegtable.tif -> 4771 (gcore/tiff_write.py:5925)
  * sasha.tif band 3 -> 31952 (gcore/tiff_write.py test_tiff_write_12;
    tiled + YCbCr-subsampled JPEG)
  * irregular_tile_size_jpeg_in_tiff.tif raises
    (test_tiff_read_irregular_tile_size_jpeg_in_tiff expects an error)

plus layout invariance (contig/tiled/separate/tiled-separate decode
bit-identically) and LZMA losslessness against the uncompressed twins.
The JPEG strips decode through the engine's bit-exact libjpeg path
(functions/jpeg.py), so these checksums are libjpeg-faithful, not
merely self-consistent.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from gdal_spark.functions.checksum import checksum_image
from gdal_spark.functions.tiff import TiffError, tiff_parse

G = "/root/reference/autotest/gcore/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(G), reason="reference autotest data missing")


def _dec(rel):
    return tiff_parse(open(os.path.join(G, rel), "rb").read())[0]


def _cks(rel):
    return checksum_image(np.squeeze(_dec(rel)))


def test_reference_expected_checksums():
    assert _cks("byte_jpg_tablesmodezero.tif") == [4743]
    assert _cks("byte_jpg_unusual_jpegtable.tif") == [4771]
    assert _cks("gtiff/byte_JPEG.tif") == [4743]
    assert _cks("sasha.tif")[2] == 31952  # band 3, reference expectation


def test_layout_invariance_rgb():
    base = _dec("gtiff/rgbsmall_JPEG.tif")
    for rel in ("gtiff/rgbsmall_JPEG_tiled.tif",
                "gtiff/rgbsmall_JPEG_separate.tif",
                "gtiff/rgbsmall_JPEG_tiled_separate.tif"):
        np.testing.assert_array_equal(_dec(rel), base)
    assert checksum_image(base) == [21629, 21651, 21371]


def test_ycbcr_subsampled_strip():
    a = _dec("gtiff/rgbsmall_JPEG_ycbcr.tif")
    ref = _dec("rgbsmall.tif")
    mse = ((a.astype(float) - ref.astype(float)) ** 2).mean()
    assert 10 * np.log10(255 ** 2 / mse) > 28.0


def test_gray_tiled_equals_striped():
    np.testing.assert_array_equal(_dec("gtiff/byte_JPEG.tif"),
                                  _dec("gtiff/byte_JPEG_tiled.tif"))


def test_too_big_last_stripe():
    a = _dec("tif_jpeg_too_big_last_stripe.tif")
    assert np.squeeze(a).shape == (19, 20)
    b = _dec("tif_jpeg_ycbcr_too_big_last_stripe.tif")
    assert b.shape[:2] == (19, 20)


def test_irregular_tile_size_raises_like_reference():
    with pytest.raises((TiffError, ValueError)):
        _dec("irregular_tile_size_jpeg_in_tiff.tif")


def test_lzma_lossless():
    byte = np.squeeze(_dec("byte.tif"))
    np.testing.assert_array_equal(np.squeeze(_dec("gtiff/byte_LZMA.tif")),
                                  byte)
    np.testing.assert_array_equal(
        np.squeeze(_dec("gtiff/byte_LZMA_tiled.tif")), byte)
    rgb = _dec("rgbsmall.tif")
    for rel in ("gtiff/rgbsmall_LZMA.tif", "gtiff/rgbsmall_LZMA_tiled.tif",
                "gtiff/rgbsmall_LZMA_separate.tif",
                "gtiff/rgbsmall_LZMA_tiled_separate.tif"):
        np.testing.assert_array_equal(_dec(rel), rgb)
