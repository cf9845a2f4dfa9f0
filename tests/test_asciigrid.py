"""AAIGrid + GRASS ASCII grid vs the reference autotest
(autotest/gdrivers/aaigrid.py, grassasciigrid.py)."""

import math
import os

import numpy as np
import pytest

from gdal_spark.functions.checksum import checksum
from gdal_spark.functions.tiff import tiff_parse
from gdal_spark.raster.asciigrid import aaig_decode, aaig_encode, grass_decode

AD = "/root/reference/autotest/gdrivers/data/aaigrid"
GCORE = "/root/reference/autotest/gcore/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(AD), reason="reference autotest data not present"
)


def _read(path):
    with open(path, "rb") as fh:
        return fh.read()


def test_read_byte_tif_grd():
    arr, _ = aaig_decode(_read(os.path.join(AD, "byte.tif.grd")))
    assert checksum(arr) == 4672


def test_aaigrid_1_pixel_per_line():
    arr, meta = aaig_decode(_read(os.path.join(AD, "pixel_per_line.asc")))
    assert checksum(arr) == 1123
    # test_aaigrid_2 auxiliary data
    assert meta["gt"] == (100000.0, 50.0, 0.0, 650600.0, 0.0, -50.0)
    assert meta["nodata"] == -99999
    assert meta["dtype"] == "Float32"


def test_aaigrid_4_subwindow():
    # GDALTest(..., 187, 5, 5, 5, 5): checksum of the 5x5 window at (5,5)
    arr, _ = aaig_decode(_read(os.path.join(AD, "pixel_per_line.asc")))
    assert checksum(arr[5:10, 5:10]) == 187


def test_aaigrid_comma_decimal_separator():
    arr, meta = aaig_decode(_read(os.path.join(AD, "pixel_per_line_comma.asc")))
    assert meta["gt"] == (100000.0, 50.0, 0.0, 650600.0, 0.0, -50.0)
    assert checksum(arr) == 1123
    assert meta["nodata"] == -99999
    assert meta["dtype"] == "Float32"


def test_aaigrid_5_mixed_case():
    arr, _ = aaig_decode(_read(os.path.join(AD, "case_sensitive.ASC")))
    assert checksum(arr) == 1123


def test_aaigrid_6_nodata_dtype():
    _, meta = aaig_decode(_read(os.path.join(AD, "nodata_float.asc")))
    assert meta["nodata"] == -99999
    assert meta["dtype"] == "Float32"
    _, meta = aaig_decode(_read(os.path.join(AD, "nodata_int.asc")))
    assert meta["nodata"] == -99999
    assert meta["dtype"] == "Int32"


def test_aaigrid_10_datatype_option():
    raw = _read(os.path.join(AD, "float64.asc"))
    _, meta = aaig_decode(raw)
    assert meta["dtype"] == "Float32"  # default detection
    arr, meta = aaig_decode(raw, datatype="Float64")
    assert meta["dtype"] == "Float64"
    assert meta["nodata"] == pytest.approx(-1.234567890123, abs=1e-16)
    vals = arr[arr != meta["nodata"]]
    assert vals.min() == pytest.approx(1.234567890123, abs=1e-16)
    assert vals.max() == pytest.approx(1.234567890123, abs=1e-16)


_NULL_ASC = """ncols        4
nrows        1
xllcorner    0
yllcorner    -1
cellsize     1
NODATA_value  null
null 1.5 null 3.5
"""


def test_aaigrid_null():
    arr, meta = aaig_decode(_NULL_ASC.encode())
    assert meta["dtype"] == "Float32"
    assert meta["nodata"] < -1e38
    vals = arr[arr != np.float32(meta["nodata"])]
    assert (vals.min(), vals.max()) == (1.5, 3.5)


def test_aaigrid_null_float64():
    arr, meta = aaig_decode(_NULL_ASC.encode(), datatype="Float64")
    assert meta["dtype"] == "Float64"
    assert meta["nodata"] < -1e308
    vals = arr[arr != meta["nodata"]]
    assert (vals.min(), vals.max()) == (1.5, 3.5)


def test_aaigrid_starting_with_nan():
    arr, meta = aaig_decode(_read(os.path.join(AD, "starting_with_nan.asc")))
    assert meta["dtype"] == "Float32"
    assert checksum(arr) == 65300


def test_aaigrid_nodata_nan():
    _, meta = aaig_decode(_read(os.path.join(AD, "nodata_nan.asc")))
    assert meta["dtype"] == "Float32"
    assert math.isnan(meta["nodata"])


@pytest.mark.parametrize(
    "fname,cs",
    [("byte.tif", 4672), ("int16.tif", 4672), ("uint16.tif", 4672),
     ("float32.tif", 4672), ("utmsmall.tif", 50054)],
)
def test_createcopy(fname, cs):
    arr, meta = tiff_parse(_read(os.path.join(GCORE, fname)))
    gt = meta.get("gt") or (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
    text = aaig_encode(arr, gt)
    back, meta2 = aaig_decode(text.encode())
    assert checksum(back) == cs
    assert meta2["gt"] == pytest.approx(gt, abs=1e-6)


def test_write_south_up_raster():
    # test_aaigrid_write_south_up_raster (#6946)
    arr = np.array([[1.0], [2.0]], dtype=np.float32)
    text = aaig_encode(arr, (2, 1, 0, 49, 0, 1))
    back, meta = aaig_decode(text.encode())
    assert meta["gt"] == pytest.approx((2, 1, 0, 51, 0, -1))
    assert back[0, 0] == 2 and back[1, 0] == 1


def test_decimal_precision():
    # test_aaigrid_9: DECIMAL_PRECISION=2 on ehdr/float32.bil -> min -0.84
    from gdal_spark.raster.rawfmts import ehdr_decode
    ed = "/root/reference/autotest/gdrivers/data/ehdr"
    hdr = _read(os.path.join(ed, "float32.hdr")).decode()
    arr, meta = ehdr_decode(hdr, _read(os.path.join(ed, "float32.bil")))
    if arr.ndim == 3:
        arr = arr[:, :, 0]
    text = aaig_encode(arr.astype(np.float32), meta["gt"],
                       nodata=meta.get("nodata"), decimal_precision=2)
    back, meta2 = aaig_decode(text.encode())
    nd = meta2.get("nodata")
    vals = back if nd is None else back[back != np.float32(nd)]
    assert float(vals.min()) == pytest.approx(-0.84, abs=1e-7)


def test_float_write_first_decimal_dot():
    # #6060: integral float values still read back as Float32
    arr = np.array([[1.0, 2.0]], dtype=np.float32)
    text = aaig_encode(arr, (0, 1, 0, 1, 0, -1))
    _, meta = aaig_decode(text.encode())
    assert meta["dtype"] == "Float32"
    assert "1.0" in text.splitlines()[-1]


def test_grassasciigrid_1():
    gd = "/root/reference/autotest/gdrivers/data/grassasciigrid"
    arr, meta = grass_decode(_read(os.path.join(gd, "grassascii.txt")))
    assert checksum(arr) == 212
    assert meta["gt"] == pytest.approx(
        (-100.0, 62.5, 0.0, 250.0, 0.0, -41.666666666666664))
