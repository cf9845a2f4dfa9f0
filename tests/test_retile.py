"""gdal_retile parity (autotest/pyscripts/test_gdal_retile.py) plus the
distributed retile_tiles pipeline.

Pinned reference values:
  * test_gdal_retile_1 — byte.tif level-0 checksum 4672, pyramid tile
    sizes 10 and 5 (the level checksums are commented out in the
    reference test because the warp kernel changed; we assert sizes).
  * test_gdal_retile_2 — rgba.tif level-2 bands 1 and 4 checksum 35:
    the GDALReprojectImage alpha path (center-pixel density gate +
    renormalised scaled-kernel bilinear).
  * test_gdal_retile_3 — mixed pixel sizes, 100x200 mosaic checksum 38999.
  * test_gdal_retile_4 — overlap tile grids (both parameterisations).
  * test_gdal_retile_5 — float nodata preserved, min/max of valid pixels.
  * test_gdal_retile_non_contigous — boundary-touch tiles exist
    (in1_01_05 at level 0, in1_1_2 at level 1), interior gap tiles don't.
"""

import numpy as np
import pytest

from gdal_spark.functions.checksum import checksum
from gdal_spark.functions.tiff import tiff_decode, tiff_encode
from gdal_spark.raster.retile import retile, retile_tiles, tile_grid


def _cs(a):
    return int(checksum(a))


def _byte():
    with open("/root/reference/autotest/gcore/data/byte.tif", "rb") as fh:
        return tiff_decode(fh.read())[:, :, None]


def _rgba():
    with open("/root/reference/autotest/gcore/data/rgba.tif", "rb") as fh:
        return tiff_decode(fh.read())


def test_retile_byte_pyramid():
    out = retile([(_byte(), (440720, 60, 0, 3751320, 0, -60))], levels=2)
    (yi, xi, t0, gt0) = out[0][0]
    assert (yi, xi) == (1, 1)
    assert t0.shape == (20, 20, 1)
    assert _cs(t0[:, :, 0]) == 4672
    assert out[1][0][2].shape == (10, 10, 1)
    assert out[2][0][2].shape == (5, 5, 1)


def test_retile_rgba_alpha_density():
    """test_gdal_retile_2: level-2 bands 1 and 4 both checksum 35."""
    out = retile(
        [(_rgba(), (500000, 10, 0, 4500000, 0, -10))], levels=2, alpha=True
    )
    t2 = out[2][0][2]
    assert t2.shape == (5, 5, 4)
    assert _cs(t2[:, :, 0]) == 35
    assert _cs(t2[:, :, 3]) == 35
    assert _cs(t2[:, :, 1]) == 0
    assert _cs(t2[:, :, 2]) == 0
    # the surviving support is the odd-decimated alpha square
    assert (t2[1:3, 1:3, 0] == 255).all()


def test_retile_mixed_pixel_sizes():
    """test_gdal_retile_3: second input at 2x pixel size, checksum 38999."""
    in1 = (np.zeros((100, 100, 1), np.uint8), (0, 0.3, 0, 30, 0, -0.3))
    in2 = (np.full((50, 50, 1), 42, np.uint8), (0, 0.6, 0, 60, 0, -0.6))
    out = retile([in1, in2], levels=2)
    yi, xi, t0, gt = out[0][0]
    assert t0.shape == (200, 100, 1)
    assert tuple(round(g, 10) for g in gt) == (0, 0.3, 0, 60, 0, -0.3)
    assert _cs(t0[:, :, 0]) == 38999


def test_retile_overlap_grids():
    """test_gdal_retile_4: tile shapes for -ps 8 7 -overlap 3 and
    -ps 8 8 -overlap 4 (including the level-1 grid)."""
    g = [(yi, xi, w, h) for yi, xi, _, _, w, h in tile_grid(20, 20, 8, 7, 3)]
    assert len(g) == 20
    assert g[0] == (1, 1, 8, 7)
    assert g[3] == (1, 4, 5, 7)
    assert g[16] == (5, 1, 8, 4)
    assert g[19] == (5, 4, 5, 4)

    g = [(w, h) for _, _, _, _, w, h in tile_grid(20, 20, 8, 8, 4)]
    assert g == [(8, 8)] * 16
    g = [(yi, xi, w, h) for yi, xi, _, _, w, h in tile_grid(10, 10, 8, 8, 4)]
    assert g == [(1, 1, 8, 8), (1, 2, 6, 8), (2, 1, 8, 6), (2, 2, 6, 6)]


def test_retile_nodata_float():
    """test_gdal_retile_5: nodata fill preserved through the mosaic."""
    nd = -3.4028234663852886e38
    arr = np.array([[0.0, 2.0], [-1.0, nd]], np.float32)[:, :, None]
    out = retile([(arr, (0, 0.05, 0, 30, 0, -0.05))], nodata=nd)
    t = out[0][0][2]
    valid = t[t != np.float32(nd)]
    assert valid.min() == -1.0
    assert valid.max() == 2.0
    assert (t == np.float32(nd)).sum() == 1


def test_retile_non_contiguous():
    """gap tiles skipped; boundary-touch tiles created (all-zero), and the
    touch ring cascades one step per pyramid level."""
    in1 = (np.zeros((100, 100, 1), np.uint8), (0, 0.15, 0, 15, 0, -0.15))
    in2 = (np.full((100, 100, 1), 21, np.uint8), (15, 0.15, 0, 30, 0, -0.15))
    in3 = (np.full((100, 100, 1), 42, np.uint8), (15, 0.15, 0, 15, 0, -0.15))
    out = retile([in1, in2, in3], ps=(20, 20), levels=2)
    t0 = {(yi, xi) for yi, xi, _, _ in out[0]}
    t1 = {(yi, xi) for yi, xi, _, _ in out[1]}
    assert (1, 5) in t0  # in1_01_05.tif exists (touches 15E boundary)
    assert (1, 1) not in t0
    assert (1, 2) in t1  # 1/in1_1_2.tif exists
    assert (1, 1) not in t1


def test_retile_tiles_distributed(spark):
    """distributed pipeline reproduces the numpy core bit-for-bit,
    including the alpha-density pyramid."""
    r = _rgba()
    gt = [500000.0, 10.0, 0.0, 4500000.0, 0.0, -10.0]
    df = spark.createDataFrame(
        [("img0", 0, tiff_encode(r), "tiff", gt, 20, 20)],
        "image_id string, seq int, bytes binary, fmt string, "
        "gt array<double>, w int, h int",
    )
    res = retile_tiles(df, levels=2, alpha=True).collect()
    core = retile([(r, tuple(gt))], levels=2, alpha=True)
    assert len(res) == 3
    for row in res:
        arr = tiff_decode(bytes(row.bytes))
        if arr.ndim == 2:
            arr = arr[:, :, None]
        want = [
            t for t in core[row.level]
            if t[0] == row.tile_row and t[1] == row.tile_col
        ][0][2]
        assert arr.shape == want.shape
        assert (arr == want).all()
