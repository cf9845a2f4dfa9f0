"""MiraMon raster driver vs the reference autotest
(autotest/gdrivers/miramon_read.py)."""

import os

import numpy as np
import pytest

from gdal_spark.functions.checksum import checksum
from gdal_spark.raster.miramon import miramon_open

D = "/root/reference/autotest/gdrivers/data/miramon"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(D), reason="reference autotest data missing"
)

GT = (516792.0, 2.0, 0.0, 4638260.0, 0.0, -2.0)

NORMAL = [
    "byte_2x3_6_categs.img", "byte_2x3_6_categsI.rel",
    "integer_2x3_6_categs.img", "integer_2x3_6_categsI.rel",
    "uinteger_2x3_6_categs.img", "uinteger_2x3_6_categsI.rel",
    "long_2x3_6_categs.img", "long_2x3_6_categsI.rel",
    "real_2x3_6_categs.img", "real_2x3_6_categsI.rel",
    "double_2x3_6_categs.img", "double_2x3_6_categsI.rel",
    "byte_2x3_6_categs_RLE.img", "byte_2x3_6_categs_RLEI.rel",
    "byte_2x3_6_categs_RLE_no_ind.img", "byte_2x3_6_categs_RLE_no_indI.rel",
    "integer_2x3_6_categs_RLE.img", "integer_2x3_6_categs_RLEI.rel",
    "uinteger_2x3_6_categs_RLE.img", "uinteger_2x3_6_categs_RLEI.rel",
    "long_2x3_6_categs_RLE.img", "long_2x3_6_categs_RLEI.rel",
    "real_2x3_6_categs_RLE.img", "real_2x3_6_categs_RLEI.rel",
    "double_2x3_6_categs_RLE.img", "double_2x3_6_categs_RLEI.rel",
]


@pytest.mark.parametrize("name", NORMAL,
                         ids=[n.split(".")[0] for n in NORMAL])
def test_miramon_basic(name):
    """test_miramon_test_basic_raster: all six dtypes, raw + RLE
    (indexed and non-indexed), both .img and I.rel entry points;
    values 0..5, checksum 15, min 0, max 5, the UTM gt."""
    ds = miramon_open(os.path.join(D, "normal", name))
    b = ds.bands[0]
    a = b.read()
    assert list(a.astype(float).ravel()) == [0, 1, 2, 3, 4, 5]
    assert checksum(a) == 15
    assert (b.minimum, b.maximum) == (0, 5)
    assert b.geotransform == GT


def test_miramon_bit():
    """chess_bit: LSB-first bit expansion, default 0..cols/rows gt."""
    ds = miramon_open(os.path.join(D, "normal", "chess_bit.img"))
    b = ds.bands[0]
    a = b.read()
    assert list(a.ravel()[:16]) == [0, 1, 0, 1, 0, 1, 0, 1,
                                    1, 0, 1, 0, 1, 0, 1, 0]
    assert checksum(a) == 32
    assert b.geotransform == (0.0, 1.0, 0.0, 8.0, 0.0, -1.0)


def test_miramon_all_nodata():
    ds = miramon_open(os.path.join(D, "all_nodata", "nodataI.rel"))
    b = ds.bands[0]
    a = b.read()
    assert list(a.astype(float).ravel()) == [0.0] * 6
    assert checksum(a) == 0
    assert b.minimum is None and b.maximum is None


def test_miramon_subdatasets():
    """test_miramon_subdatasets_detection / _number: 5 subdatasets for
    the multiband rel (bands differ in nodata/extent), reachable from
    the .img too; 10 for the subdatasets fixture (byte + byte-RLE group
    because compatibility compares the uncompressed data type)."""
    rel = os.path.join(D, "multiband", "byte_2x3_6_multibandI.rel")
    ds = miramon_open(rel)
    assert len(ds.subdatasets) == 5
    ds2 = miramon_open(os.path.join(D, "multiband", "byte_2x3_6_categs.img"))
    assert len(ds2.subdatasets) == 5

    # subdataset 1: plain 0..5
    sub = miramon_open(ds.subdatasets[0][0])
    b = sub.bands[0]
    assert list(b.read().astype(float).ravel()) == [0, 1, 2, 3, 4, 5]
    assert b.nodata is None and (b.minimum, b.maximum) == (0, 5)
    # subdataset 2: nodata 255
    sub = miramon_open(ds.subdatasets[1][0])
    b = sub.bands[0]
    assert list(b.read().astype(float).ravel()) == [0, 1, 2, 3, 4, 255]
    assert b.nodata == 255 and (b.minimum, b.maximum) == (0, 4)
    # subdataset 3: nodata 0, min 1
    sub = miramon_open(ds.subdatasets[2][0])
    b = sub.bands[0]
    assert list(b.read().astype(float).ravel()) == [0, 1, 2, 3, 4, 5]
    assert b.nodata == 0 and (b.minimum, b.maximum) == (1, 5)

    ds3 = miramon_open(os.path.join(D, "subdatasets", "byteI.rel"))
    assert len(ds3.subdatasets) == 10


@pytest.mark.parametrize("name,msg", [
    ("alone_rel.rel", "not recognized"),
    ("alone_IrelI.rel", "must have VersMetaDades>=4"),
    ("empy_img.img", "not recognized"),
    ("empy_relI.rel", "must be REL4"),
    ("no_assoc_img.rel", "not recognized"),
    ("no_assoc_rel.img", "not recognized"),
    ("no_colI.rel", "No number of columns documented"),
    ("no_rowI.rel", "No number of rows documented"),
    ("no_zero_col_rowI.rel", "(nWidth <= 0 || nHeight <= 0)"),
    ("no_bandsI.rel", "ATTRIBUTE_DATA-IndexsNomsCamps section-key should exist"),
    ("no_bands2I.rel", "zero usable bands"),
    ("no_bands3I.rel", "ATTRIBUTE_DATA-IndexsNomsCamps section-key should exist"),
    ("no_typeI.rel", "no nDataType documented"),
    ("wrong_typeI.rel", "data type unhandled"),
    ("wrong_band_nameI.rel", "Failed to open MiraMon band file"),
])
def test_miramon_errors(name, msg):
    """test_miramon_test_fails: reference error-message parity."""
    with pytest.raises(Exception) as e:
        miramon_open(os.path.join(D, "several_errors", name))
    assert msg in str(e.value)


def test_miramon_identify():
    from gdal_spark.sources.identify import identify_driver

    p = os.path.join(D, "normal", "byte_2x3_6_categsI.rel")
    assert identify_driver(open(p, "rb").read(1024), p) == "MiraMonRaster"
