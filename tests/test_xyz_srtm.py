"""XYZ grid + SRTMHGT drivers vs the reference autotest
(autotest/gdrivers/xyz.py, srtmhgt.py)."""

import os
import struct

import numpy as np
import pytest

from gdal_spark.functions.checksum import checksum
from gdal_spark.raster.srtmhgt import srtmhgt_decode, srtmhgt_encode
from gdal_spark.raster.xyzgrid import xyz_decode, xyz_encode

GCORE = "/root/reference/autotest/gcore/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(GCORE), reason="reference autotest data not present"
)


def test_xyz_1_byte_roundtrip():
    from gdal_spark.functions.tiff import tiff_parse
    arr, meta = tiff_parse(open(os.path.join(GCORE, "byte.tif"), "rb").read())
    gt = meta.get("gt") or (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
    text = xyz_encode(arr.astype(np.uint8), gt)
    back, meta2 = xyz_decode(text)
    assert checksum(back) == 4672
    assert meta2["gt"] == pytest.approx(gt)
    assert meta2["dtype"] == "Byte"


def test_xyz_2_float_comma_header():
    rng = np.random.RandomState(7)
    arr = (rng.rand(20, 20) * 100).astype(np.float32)
    gt = (10.0, 1.0, 0.0, 20.0, 0.0, -1.0)
    text = xyz_encode(arr, gt, column_separator="COMMA", add_header_line=True)
    assert text.startswith("X,Y,Z\n")
    back, meta = xyz_decode(text)
    assert meta["dtype"] == "Float32"
    assert np.allclose(back, arr)


def test_xyz_3_yxz_header():
    content = """Y X Z
0 0 65


0 1 66

1 0 67

1 1 68
2 0 69
2 1 70


"""
    arr, meta = xyz_decode(content)
    # Y column first (from the header): rows follow the file's Y order
    assert arr.shape == (3, 2)
    assert tuple(arr[2]) == (69, 70)
    assert tuple(arr[1]) == (67, 68)
    assert tuple(arr[0]) == (65, 66)


def test_xyz_4_missing_values_inexact_spacing():
    content = """
440750.001 3751290 1
440809.999 3751290 2

440690 3751170.001 3
440750.001 3751170.001 4
440870 3751170.001 6

440810 3751050 7"""
    arr, meta = xyz_decode(content)
    expected_gt = (440660.0, 60.0, 0.0, 3751350.0, 0.0, -120.0)
    assert meta["gt"] == pytest.approx(expected_gt, abs=1e-5)
    assert meta["min_z"] == 1 and meta["max_z"] == 7
    assert meta["nodata"] == 0
    assert arr.shape == (3, 4)
    assert tuple(arr[0]) == (0, 1, 2, 0)
    assert tuple(arr[1]) == (3, 4, 0, 6)
    assert tuple(arr[2]) == (0, 0, 7, 0)


def test_xyz_organized_by_columns_int16():
    # autotest test_xyz_organized_by_columns_int16
    content = """440720 3751320 0
440720 3751260 1
440720 3751200 2
440780 3751320 3
440780 3751260 4
440780 3751200 5
"""
    arr, meta = xyz_decode(content)
    assert meta["organization"] == "columns"
    assert meta["dtype"] == "Int16"  # bIngestAll promotes Byte
    assert arr.shape == (3, 2)
    # north-up presentation: row 0 = max Y
    assert tuple(arr[:, 0]) == (0, 1, 2)
    assert tuple(arr[:, 1]) == (3, 4, 5)
    assert meta["gt"] == pytest.approx((440690.0, 60.0, 0.0, 3751350.0,
                                        0.0, -60.0))


def test_xyz_column_order_yxz_option():
    content = "0 0 65\n1 0 66\n0 1 67\n1 1 68\n"
    arr, meta = xyz_decode(content, column_order="YXZ")
    assert arr.shape == (2, 2)
    with pytest.raises(ValueError):
        xyz_decode(content, column_order="BAD")


def test_xyz_south_up_file_order():
    # file rows south -> north: dataset presented south-up (yscale > 0)
    content = "0 0 1\n1 0 2\n0 1 3\n1 1 4\n"
    arr, meta = xyz_decode(content)
    assert meta["gt"][5] == pytest.approx(1.0)
    assert tuple(arr[0]) == (1, 2)
    assert tuple(arr[1]) == (3, 4)


def test_srtmhgt_1_checksum():
    # the autotest fixture: n43.dt0 (121x121) nearest-upsampled to 1201
    from gdal_spark.raster.dted import read_dted
    from gdal_spark.raster.kernels import resample_nearest
    d = read_dted(open("/root/reference/autotest/gdrivers/data/n43.dt0",
                       "rb").read())
    big = resample_nearest(d["array"], 1201, 1201).astype(np.int16)
    data = srtmhgt_encode(big)
    arr, meta = srtmhgt_decode(data, "n43w080.hgt")
    assert checksum(arr) == 60918
    assert meta["gt"] == pytest.approx(
        (-80.0 - 1 / 2400, 1 / 1200, 0, 44.0 + 1 / 2400, 0, -1 / 1200))
    assert meta["nodata"] == -32768


def test_srtmhgt_4_raw_byte():
    # SRTMSWBD .raw: 3601x3601 1-byte; value pattern like the autotest
    data = struct.pack("B", 255) * (3601 * 3601)
    arr, meta = srtmhgt_decode(data, "N43W080.raw")
    assert arr.dtype == np.uint8
    assert "nodata" not in meta
    assert int(arr[0, 0]) == 255


def test_srtmhgt_hgts_float():
    data = struct.pack(">f", 1.25) * (3601 * 3601)
    arr, _ = srtmhgt_decode(data, "n00e006.hgts")
    assert arr.dtype == np.float32
    assert float(arr.min()) == 1.25 and float(arr.max()) == 1.25


@pytest.mark.parametrize(
    "width,height,nb_bytes",
    [(1201, 1201, 2), (1801, 3601, 2), (3601, 3601, 1),
     (3601, 3601, 2), (3601, 3601, 4), (7201, 7201, 2)],
)
def test_srtmhgt_all_supported_sizes(width, height, nb_bytes):
    data = b"\x00" * (width * height * nb_bytes)
    arr, meta = srtmhgt_decode(data, "n00e000.hgt")
    assert arr.shape == (height, width)
    assert meta["gt"][1] == pytest.approx(1.0 / (width - 1), rel=1e-8)
    expected = {1: np.uint8, 2: np.int16, 4: np.float32}[nb_bytes]
    assert arr.dtype == expected
