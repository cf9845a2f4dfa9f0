"""Parity for the remaining gdal-utils scripts: gdal2xyz, rgb2pct /
pct2rgb (checksums over quantize.py), gdalmove, gdal_edit.

Pinned reference values:
  * test_gdal2xyz_py_srcnodata_dstnodata — first rgbsmall line
    "-44.838604 -22.9343 1 2 3";
  * test_gdal2xyz_py_vsistdout — byte.tif xyz text reparses to the
    original geotransform and checksum 4672;
  * test_pct.py — rgb2pct 31231 (256 colors), 16596 (-n 16), pct2rgb
    20963 with band-1 max diff <= 18;
  * test_gdalmove_1 — clrk66 UTM11 -> EPSG:32611 geotransform at 1e-5
    relative;
  * test_gdal_edit_py_1/1b — -a_ullr and the three -a_ulurll fits.
"""

import numpy as np
import pytest

from gdal_spark.functions.checksum import checksum
from gdal_spark.functions.gridfmts import xyz_decode
from gdal_spark.functions.tiff import tiff_decode
from gdal_spark.raster import quantize as Q
from gdal_spark.raster.move import (
    edit_images,
    gt_from_ullr,
    gt_from_ulurll,
    move_geotransform,
    move_images,
)
from gdal_spark.raster.xyz import gdal2xyz_arrays, gdal2xyz_text, raster_to_xyz

BYTE_GT = (440720, 60, 0, 3751320, 0, -60)


def _byte():
    with open("/root/reference/autotest/gcore/data/byte.tif", "rb") as fh:
        return tiff_decode(fh.read())


def _rgbsmall():
    with open("/root/reference/autotest/gcore/data/rgbsmall.tif", "rb") as fh:
        return tiff_decode(fh.read())


RGBSMALL_GT = (-44.84032, 0.003432, 0, -22.932584, 0, -0.003432)


def test_gdal2xyz_roundtrip_byte():
    txt = gdal2xyz_text(_byte(), BYTE_GT)
    arr, gt, _ = xyz_decode(txt)
    assert gt == (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
    assert int(checksum(arr)) == 4672
    # projected coords use the %.3f format
    assert txt.decode().splitlines()[0] == "440750.000 3751290.000 107"


def test_gdal2xyz_nodata_replace():
    txt = gdal2xyz_text(_rgbsmall(), RGBSMALL_GT, src_nodata=0, dst_nodata=[1, 2, 3])
    assert txt.decode().splitlines()[0] == "-44.838604 -22.9343 1 2 3"


def test_gdal2xyz_skip_nodata():
    r = _rgbsmall()
    gx, gy, data = gdal2xyz_arrays(r, RGBSMALL_GT, src_nodata=0, skip_nodata=True)
    n_nodata = int((r == 0).all(axis=2).sum())
    assert len(gx) == r.shape[0] * r.shape[1] - n_nodata
    assert not (data == 0).all(axis=1).any()


def test_rgb2pct_checksums():
    r = _rgbsmall()
    pal = Q.median_cut_pct_gdal(r, 256)
    idx = Q.dither_rgb2pct_gdal(r, pal)
    assert int(checksum(idx)) == 31231
    pal16 = Q.median_cut_pct_gdal(r, 16)
    idx16 = Q.dither_rgb2pct_gdal(r, pal16)
    assert int(checksum(idx16)) == 16596


def test_pct2rgb_checksum_and_error():
    r = _rgbsmall()
    pal = Q.median_cut_pct_gdal(r, 256)
    rgb = Q.apply_pct(Q.dither_rgb2pct_gdal(r, pal), pal)
    assert int(checksum(rgb[:, :, 0])) == 20963
    assert int(np.abs(rgb[:, :, 0].astype(int) - r[:, :, 0].astype(int)).max()) <= 18


def test_gdalmove_clrk66_to_wgs84():
    new_gt, err = move_geotransform(
        BYTE_GT, 20, 20,
        "+proj=utm +zone=11 +ellps=clrk66 +towgs84=0,0,0 +no_defs",
        "EPSG:32611",
    )
    expected = (
        440719.95870935748, 60.000041745067577, 1.9291142234578728e-05,
        3751294.2109841029, 1.9099167548120022e-05, -60.000041705276814,
    )
    for g, e in zip(new_gt, expected):
        assert abs(g - e) / abs(e) <= 1e-5
    assert err <= 1.0  # the autotest runs with -et 1


def test_gdal_edit_gt_fits():
    assert gt_from_ullr(2, 50, 3, 49, 20, 20) == pytest.approx(
        (2.0, 0.05, 0.0, 50.0, 0.0, -0.05)
    )
    for pts, expected in (
        ((2, 50, 3, 50, 2, 49), (2, 0.05, 0, 50, 0, -0.05)),
        ((25, 70, 55, 80, 35, 40), (25, 1.5, 0.5, 70, 0.5, -1.5)),
        ((25, 70, 55, 65, 20, 40), (25, 1.5, -0.25, 70, -0.25, -1.5)),
    ):
        assert gt_from_ulurll(*pts, 20, 20) == pytest.approx(expected)


def test_edit_and_move_images_distributed(spark):
    from gdal_spark.functions.tiff import tiff_encode

    df = spark.createDataFrame(
        [("img0", tiff_encode(_byte()), "tiff", list(map(float, BYTE_GT)), 20, 20)],
        "image_id string, bytes binary, fmt string, gt array<double>, w int, h int",
    )
    edited = edit_images(
        df, a_ullr=(2, 50, 3, 49), a_nodata=123, mo={"FOO": "BAR"}
    ).collect()[0]
    assert edited.gt == pytest.approx([2.0, 0.05, 0.0, 50.0, 0.0, -0.05])
    assert edited.nodata == 123.0
    assert edited.meta["FOO"] == "BAR"

    moved = move_images(
        df,
        "+proj=utm +zone=11 +ellps=clrk66 +towgs84=0,0,0",
        "EPSG:32611",
        threshold=1.0,
    ).collect()[0]
    assert moved.moved
    assert moved.gt[0] == pytest.approx(440719.95870935748, rel=1e-5)
    assert moved.gt[5] == pytest.approx(-60.000041705276814, rel=1e-5)

    from pyspark.sql import functions as F

    xyz = raster_to_xyz(df)
    assert xyz.count() == 400
    first = xyz.orderBy(F.desc("geo_y"), F.asc("geo_x")).first()
    assert first.geo_x == 440750.0 and first.geo_y == 3751290.0
    assert first.b1 == 107.0
