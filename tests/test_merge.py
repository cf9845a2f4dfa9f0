"""gdal_merge parity (autotest/pyscripts/test_gdal_merge.py tests 1-5)
plus the distributed merge_tiles painter."""

import numpy as np
import pytest

from gdal_spark.functions.checksum import checksum
from gdal_spark.functions.tiff import tiff_decode
from gdal_spark.raster.merge import gdal_merge


def _cs(a):
    return int(checksum(a))


@pytest.fixture()
def samples():
    return [
        (np.zeros((10, 10), np.uint8), (2, 0.1, 0, 49, 0, -0.1)),
        (np.full((10, 10), 63, np.uint8), (3, 0.1, 0, 49, 0, -0.1)),
        (np.full((10, 10), 127, np.uint8), (2, 0.1, 0, 48, 0, -0.1)),
        (np.full((10, 10), 255, np.uint8), (3, 0.1, 0, 48, 0, -0.1)),
    ]


def test_merge_single_copy():
    with open("/root/reference/autotest/gcore/data/byte.tif", "rb") as fh:
        b = tiff_decode(fh.read())
    out, gt = gdal_merge([(b, (440720, 60, 0, 3751320, 0, -60))])
    assert _cs(out[:, :, 0]) == 4672


def test_merge_four_tiles(samples):
    out, gt = gdal_merge(samples)
    assert out.shape == (20, 20, 1)
    assert tuple(round(g, 6) for g in gt) == (2, 0.1, 0, 49, 0, -0.1)
    assert _cs(out[:, :, 0]) == 3508


def test_merge_separate(samples):
    out, _ = gdal_merge(samples, separate=True)
    assert out.shape[2] == 4
    assert _cs(out[:, :, 0]) == 0


def test_merge_init(samples):
    out, _ = gdal_merge([samples[1], samples[2]], init=255)
    assert out.shape == (20, 20, 1)
    assert _cs(out[:, :, 0]) == 4725


def test_merge_alpha_overwrite():
    """#3669: later file's zero bands fully overwrite earlier fills"""
    i5 = np.zeros((10, 10, 4), np.uint8)
    i5[:, :, 0] = 255
    i6 = np.zeros((10, 10, 4), np.uint8)
    i6[:, :, 1] = 255
    i6[:, :, 3] = 255
    want = _cs(i6[:, :, 3])
    gt = (2, 0.1, 0, 49, 0, -0.1)
    out, _ = gdal_merge([(i5, gt), (i6, gt)])
    assert [_cs(out[:, :, b]) for b in range(4)] == [0, want, 0, want]


def test_merge_nodata_skip():
    """-n: source cells equal to nodata leave the target untouched"""
    a = np.full((4, 4), 7, np.uint8)
    b = np.full((4, 4), 9, np.uint8)
    b[0, :] = 5
    gt = (0, 1, 0, 0, 0, -1)
    out, _ = gdal_merge([(a, gt), (b, gt)], nodata=5)
    assert int(out[0, 0, 0]) == 7 and int(out[1, 0, 0]) == 9


def test_merge_tap_and_ul_lr():
    a = np.full((4, 4), 3, np.uint8)
    out, gt = gdal_merge([(a, (0.4, 1, 0, -0.4, 0, -1))], tap=True)
    assert gt[0] == 0.0 and gt[3] == 0.0 and out.shape[:2] == (5, 5)
    out, gt = gdal_merge([(a, (0, 1, 0, 0, 0, -1))], ul_lr=(0, 0, 8, -8))
    assert out.shape[:2] == (8, 8)


def test_merge_tiles_distributed(spark):
    """tile-partitioned painter == numpy core over an overlapping grid"""
    import pandas as pd

    from gdal_spark.functions import codecs
    from gdal_spark.functions.tiff import tiff_encode
    from gdal_spark.raster.merge import merge_tiles

    rng = np.random.RandomState(7)
    inputs, rows = [], []
    for k in range(9):
        arr = rng.randint(0, 200, (16, 16)).astype(np.uint8)
        gt = ((k % 3) * 12.0, 1.0, 0.0, -((k // 3) * 12.0), 0.0, -1.0)
        inputs.append((arr, gt))
        rows.append(("img%d" % k, k, tiff_encode(arr), "tiff", list(gt), 16, 16))
    golden, ggt = gdal_merge(inputs)

    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["image_id", "seq", "bytes", "fmt", "gt", "w", "h"])
    )
    tiles = merge_tiles(df, tile=16).collect()
    out = np.zeros(golden.shape[:2], dtype=np.uint8)
    for t in tiles:
        arr = codecs.decode_image(bytes(t.bytes), "tiff")
        band = arr[:, :, 0] if arr.ndim == 3 else arr
        x0, y0 = t.tile_x * 16, t.tile_y * 16
        out[y0 : y0 + t.h, x0 : x0 + t.w] = band
    np.testing.assert_array_equal(out, golden[:, :, 0])
