"""gdal raster reclassify parity (frmts/vrt/vrtreclassifier.cpp via
autotest/utilities/test_gdalalg_raster_reclassify.py).

Pinned reference behavior:
  * basic_1 — nodata_byte.tif, mapping "165=120; (-inf,0)=140; (0,100]=140;
    (100,130]=PASS_THROUGH; DEFAULT=160; NO_DATA=NO_DATA": constants,
    open/closed intervals, pass-through ranges, default, nodata identity.
  * the @file mapping form is newline-separated with '#' comments.
  * output_type — "(-inf,132)=0; [132,inf)=1" splits on 132 exactly.
  * source_transfer_type — "[-inf,500)=3; [500,inf]=7" maps 500+ to 7.
  * many_ranges — every pixel lands in its half-open bin.
  * empty / invalid mappings and overlapping intervals are errors
    (Reclassifier::Init + Finalize).
"""

import math

import numpy as np
import pytest

from gdal_spark.functions.tiff import tiff_decode, tiff_encode
from gdal_spark.raster.reclassify import (
    parse_mapping,
    reclassify_array,
    reclassify_tiles,
)

BASIC = (
    "165 = 120; (-inf, 0) = 140; (0, 100] = 140; "
    "(100,  130] = PASS_THROUGH; DEFAULT = 160; NO_DATA = NO_DATA"
)

BASIC_FILE = """
   # A sample reclassification
   165         = 120
   (-inf, 0)   = 140 # Match everything <= 100
   (0, 100]    = 140 # manually exclude NoData value of 0
   (100, 130]  = PASS_THROUGH
   DEFAULT     = 160
   NO_DATA     = NO_DATA
"""


def _nodata_byte():
    with open("/root/reference/autotest/gcore/data/byte.tif", "rb") as fh:
        return tiff_decode(fh.read()).astype(np.float64)


def _check_basic(dst, src):
    assert np.all(dst[src == 165] == 120)
    assert np.all(dst[src == 0] == 0)  # NO_DATA = NO_DATA (nodata 0)
    m = (src > 0) & (src <= 100)
    assert np.all(dst[m] == 140)
    m = (src > 100) & (src <= 130)
    assert np.array_equal(dst[m], src[m])  # PASS_THROUGH
    m = (src > 130) & (src != 165)
    assert np.all(dst[m] == 160)  # DEFAULT


def test_reclassify_basic_text():
    src = _nodata_byte()
    dst = reclassify_array(src, BASIC, nodata=0.0)
    _check_basic(dst, src)


def test_reclassify_mapping_file_form():
    # newline-separated entries with comments parse identically
    src = _nodata_byte()
    dst = reclassify_array(src, BASIC_FILE, nodata=0.0)
    _check_basic(dst, src)


def test_reclassify_output_type_split():
    src = _nodata_byte()
    dst = reclassify_array(
        src, "(-inf, 132)=0; [132, inf)=1", out_dtype=np.int16
    )
    assert dst.dtype == np.int16
    assert np.all(dst[src < 132] == 0)
    assert np.all(dst[src >= 132] == 1)


def test_reclassify_closed_inf_bounds():
    # [-inf, 500)=3; [500, inf]=7 over values >= 500 -> all 7
    src = np.full((4, 5), 500.0) + np.arange(20).reshape(4, 5)
    dst = reclassify_array(src, "[-inf, 500)=3; [500, inf]=7")
    assert np.all(dst == 7)
    assert reclassify_array(np.array([[499.0]]), "[-inf,500)=3;[500,inf]=7")[
        0, 0
    ] == 3


def test_reclassify_many_ranges():
    rng = np.random.RandomState(802)
    data = rng.rand(40, 40) * 1000
    breaks = list(np.linspace(data.min(), data.max(), 99))
    bins = {
        i: (a, b)
        for i, (a, b) in enumerate(zip(breaks, breaks[1:] + [math.inf]))
    }
    mapping = "\n".join(f"[{a}, {b}) = {i}" for i, (a, b) in bins.items())
    res = reclassify_array(data, mapping)
    for i in range(data.shape[0]):
        for j in range(data.shape[1]):
            a, b = bins[int(res[i, j])]
            assert a <= data[i, j] < b


def test_reclassify_nan_rule():
    src = np.array([[1.0, math.nan, 3.0]])
    dst = reclassify_array(src, "NAN = -1; DEFAULT = PASS_THROUGH")
    assert dst[0, 1] == -1
    assert dst[0, 0] == 1.0
    dst2 = reclassify_array(src, "NAN = PASS_THROUGH; DEFAULT = 0")
    assert math.isnan(dst2[0, 1])
    assert dst2[0, 0] == 0.0


def test_reclassify_errors():
    with pytest.raises(ValueError):
        parse_mapping("")
    with pytest.raises(ValueError):
        parse_mapping("invalid")
    with pytest.raises(ValueError):  # overlap (Finalize:165-193)
        parse_mapping("[0, 10] = 1; [5, 15] = 2")
    with pytest.raises(ValueError):  # NO_DATA without nodata set
        parse_mapping("NO_DATA = 5")
    with pytest.raises(ValueError):  # value mapped to NO_DATA, none set
        parse_mapping("5 = NO_DATA")
    with pytest.raises(ValueError):  # unmatched value, no DEFAULT
        reclassify_array(np.array([[99.0]]), "[0, 10] = 1")
    # open bounds: (0, 10) excludes both endpoints
    rc = parse_mapping("(0, 10) = 1; DEFAULT = -1")
    out = reclassify_array(np.array([[0.0, 5.0, 10.0]]), rc)
    assert list(out[0]) == [-1.0, 1.0, -1.0]


def test_reclassify_multiple_bands():
    src = np.dstack([_nodata_byte()] * 3)
    dst = reclassify_array(src, "(-inf, 128)=0; [128, inf)=1")
    for b in range(3):
        band = src[:, :, b]
        assert np.all(dst[:, :, b][band < 128] == 0)
        assert np.all(dst[:, :, b][band >= 128] == 1)


def test_reclassify_tiles_distributed(spark):
    src = _nodata_byte()
    df = spark.createDataFrame(
        [("img0", tiff_encode(src.astype(np.uint8)), "tiff")],
        "image_id string, bytes binary, fmt string",
    )
    rows = reclassify_tiles(df, BASIC, nodata=0.0).collect()
    assert len(rows) == 1
    got = tiff_decode(bytes(rows[0].bytes)).astype(np.float64)
    want = reclassify_array(src, BASIC, nodata=0.0)
    assert np.array_equal(got, want.astype(np.uint8).astype(np.float64))
