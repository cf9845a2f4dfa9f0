"""Vertical shift grid parity (alg/gdalapplyverticalshiftgrid.cpp via
autotest/alg/applyverticalshiftgrid.py):

  * test 1 — byte.tif resized 20x40, grid == src: checksum 10038;
    inverse: checksum 0.
  * test 4 — source-nodata passthrough; grid-nodata -> shift 0;
    ERROR_ON_MISSING_VERT_SHIFT raises on off-extent and nodata grids.
  * test 5 — srcUnitToMeter=2 / dstUnitToMeter=0.5 over a scaled
    float source against a zero grid: checksum 4672 (byte.tif's own).
"""

import numpy as np
import pytest

from gdal_spark.functions.checksum import checksum
from gdal_spark.functions.tiff import tiff_decode, tiff_encode
from gdal_spark.raster.kernels import resample_nearest
from gdal_spark.raster.vshift import apply_vertical_shift, vshift_tiles

GT = [440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0]


def _byte_20x40():
    with open("/root/reference/autotest/gcore/data/byte.tif", "rb") as fh:
        arr = tiff_decode(fh.read())
    out = resample_nearest(arr[:, :, None], 40, 20)[:, :, 0]
    # gdal.Translate(width=20, height=40) keeps the extent: resolutions scale
    gt = [440720.0, 60.0, 0.0, 3751320.0, 0.0, -30.0]
    return out, gt


def test_avsg_1_checksum_and_inverse():
    src, gt = _byte_20x40()
    out = apply_vertical_shift(src, src, gt, gt)
    assert out.dtype == np.uint8
    assert int(checksum(out)) == 10038
    inv = apply_vertical_shift(src, src, gt, gt, inverse=True)
    assert int(checksum(inv)) == 0
    # Float32 output type
    invf = apply_vertical_shift(
        src, src, gt, gt, inverse=True, out_dtype=np.float32
    )
    assert invf.dtype == np.float32 and int(checksum(invf)) == 0


def test_avsg_4_nodata_semantics():
    gt1 = [0.0, 1.0, 0.0, 0.0, 0.0, -1.0]
    src = np.array([[1.0]])
    grid = np.array([[30.0]])
    # source nodata passes through untouched
    out = apply_vertical_shift(src, grid, gt1, gt1, src_nodata=1.0)
    assert out[0, 0] == 1.0
    # grid nodata -> shift 0
    out2 = apply_vertical_shift(src, grid, gt1, gt1, grid_nodata=30.0)
    assert out2[0, 0] == 1.0
    # off-extent grid with error flag raises
    gt_off = [10.0, 1.0, 0.0, 0.0, 0.0, -1.0]
    src255 = np.array([[255.0]])
    with pytest.raises(ValueError, match="Missing vertical grid value"):
        apply_vertical_shift(
            src255, grid, gt1, gt_off, error_on_missing=True
        )
    # grid nodata with error flag raises
    with pytest.raises(ValueError, match="Missing vertical grid value"):
        apply_vertical_shift(
            src255, grid, gt1, gt1, grid_nodata=30.0, error_on_missing=True
        )
    # without the flag, off-extent shifts by 0
    out3 = apply_vertical_shift(src255, grid, gt1, gt_off)
    assert out3[0, 0] == 255.0


def test_avsg_5_unit_factors():
    with open("/root/reference/autotest/gcore/data/byte.tif", "rb") as fh:
        arr = tiff_decode(fh.read()).astype(np.float64)
    scaled = arr * 0.5  # gdal.Translate scaleParams [[0,1,0,0.5]]
    zeros = np.zeros_like(arr)
    out = apply_vertical_shift(
        scaled.astype(np.float32), zeros, GT, GT,
        src_unit_to_meter=2.0, error_on_missing=True,
    )
    assert int(checksum(out)) == 4672
    out2 = apply_vertical_shift(
        scaled.astype(np.float32), zeros, GT, GT,
        dst_unit_to_meter=0.5, error_on_missing=True,
    )
    assert int(checksum(out2)) == 4672


def test_vshift_tiles_distributed(spark):
    src, gt = _byte_20x40()
    grid = np.full((4, 4), 7.0)
    ggt = [440720.0, 300.0, 0.0, 3751320.0, 0.0, -300.0]
    df = spark.createDataFrame(
        [("img0", tiff_encode(src), "tiff", gt)],
        "image_id string, bytes binary, fmt string, gt array<double>",
    )
    rows = vshift_tiles(df, grid, ggt, resampling="near").collect()
    want = apply_vertical_shift(
        src, grid, gt, ggt, resampling="near", out_dtype=np.float64
    ).sum()
    assert rows[0].shifted_sum == pytest.approx(float(want))
