"""Round-3 codec-variant sweep, pinned against the reference autotest's
own expected checksums where stated:

  TGA (gdrivers/tga.py): cbw8/ubw8 43089; ctc24/utc24 9797/9952/9848;
    utc16 64747/64839/64796 (5-bit << 3 expansion, tgadataset.cpp:374);
    16-bit color maps expand the same way.
  PNG 16-bit (gdrivers/png.py): rgba16 band3 1815 / band4 4873;
    uint16_interlaced 4672 (Adam7 at 16 bits/sample).
  BMP: 1/4-bit palettes and BI_RLE8/BI_RLE4 — the RLE fixtures decode
    bit-identically to their uncompressed palette twins (byte_rle8 =
    canonical byte checksum 4672).
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from gdal_spark.functions.checksum import checksum_image
from gdal_spark.functions.codecs import png_decode
from gdal_spark.functions.morefmts import bmp_decode, tga_decode

A = "/root/reference/autotest"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(A), reason="reference autotest data missing")


def _read(rel):
    return open(os.path.join(A, rel), "rb").read()


def test_tga_reference_suite_checksums():
    D = "gdrivers/data/tga/ref_test_suite/"
    assert checksum_image(tga_decode(_read(D + "cbw8.tga")))[0] == 43089
    assert checksum_image(tga_decode(_read(D + "ubw8.tga")))[0] == 43089
    assert checksum_image(tga_decode(_read(D + "ctc24.tga"))) == \
        [9797, 9952, 9848]
    assert checksum_image(tga_decode(_read(D + "utc24.tga"))) == \
        [9797, 9952, 9848]
    assert checksum_image(tga_decode(_read(D + "utc16.tga"))) == \
        [64747, 64839, 64796]
    a32 = tga_decode(_read(D + "utc32.tga"))
    assert a32.shape[2] == 4
    assert checksum_image(a32)[:3] == [9797, 9952, 9848]
    # palette (8-bit indices, 16-bit map entries) == its truecolor twin
    np.testing.assert_array_equal(tga_decode(_read(D + "ccm8.tga")),
                                  tga_decode(_read(D + "utc16.tga")))
    np.testing.assert_array_equal(tga_decode(_read(D + "ucm8.tga")),
                                  tga_decode(_read(D + "ccm8.tga")))


def test_png_16bit():
    D = "gdrivers/data/png/"
    a = png_decode(_read(D + "rgba16.png"))
    assert a.dtype == np.uint16 and a.shape == (20, 20, 4)
    assert checksum_image(a)[2:] == [1815, 4873]
    b = png_decode(_read(D + "uint16_interlaced.png"))
    assert b.dtype == np.uint16
    assert checksum_image(b) == [4672]
    c = png_decode(_read(D + "tbbn2c16.png"))
    assert c.shape == (32, 32, 3) and c.dtype == np.uint16


def test_bmp_palette_and_rle():
    G = "gcore/data/"
    rle8 = bmp_decode(_read(G + "byte_rle8.bmp"))
    pal8 = bmp_decode(_read(G + "8bit_pal.bmp"))
    np.testing.assert_array_equal(rle8, pal8)
    assert checksum_image(rle8)[0] == 4672  # canonical byte.tif checksum
    rle4 = bmp_decode(_read(G + "4bit_rle4.bmp"))
    pal4 = bmp_decode(_read(G + "4bit_pal.bmp"))
    np.testing.assert_array_equal(rle4, pal4)
    one = bmp_decode(_read(G + "1bit.bmp"))
    assert one.shape[2] == 3


def test_pnm_16bit_and_hostile_error_normalization():
    """uint16.pnm is byte.tif at 16 bits (lossless, canonical 4672);
    hostile inputs raise ValueError from decode_image regardless of
    the codec's internal failure mode."""
    from gdal_spark.functions import codecs

    a = codecs.decode_image(_read("gcore/data/uint16.pnm"), "pnm")
    assert a.dtype == np.uint16
    assert checksum_image(np.squeeze(a))[0] == 4672

    for rel, fmt in [("gdrivers/data/gif/fakebig.gif", "gif"),
                     ("gdrivers/data/jpeg/byte_corrupted2.jpg", "jpeg"),
                     ("gdrivers/data/jpeg/vophead.jpg", "jpeg")]:
        with pytest.raises(ValueError):
            codecs.decode_image(_read(rel), fmt)
