"""Mask-band semantics vs the reference's OWN autotest expectations
(autotest/gcore/mask.py tests 1-3: flag values and mask checksums on its
own byte.tif / byte.vrt / stefan_full_rgba.png)."""

from __future__ import annotations

import os

import numpy as np

from gdal_spark.functions.checksum import checksum
from gdal_spark.raster.maskband import (
    GMF_ALL_VALID,
    GMF_ALPHA,
    GMF_NODATA,
    GMF_PER_DATASET,
    mask_band,
    mask_flags,
    with_mask_stats,
)

GCORE = "/root/reference/autotest/gcore/data"


def _tif(name):
    from gdal_spark.functions.tiff import tiff_decode

    with open(os.path.join(GCORE, name), "rb") as fh:
        return tiff_decode(fh.read())


def test_mask_1_all_valid_byte_tif():
    arr = _tif("byte.tif")
    assert mask_flags(arr) == GMF_ALL_VALID
    m = mask_band(arr)
    assert checksum(m) == 4873  # autotest mask.py test_mask_1
    assert (m.min(), m.max(), m.mean(), m.std()) == (255, 255, 255.0, 0.0)


def test_mask_2_nodata_byte_vrt():
    from gdal_spark.raster.vrt import parse_vrt, render_vrt

    with open(os.path.join(GCORE, "byte.vrt")) as fh:
        xml = fh.read()
    arr = render_vrt(xml, GCORE)[0]
    nodata = parse_vrt(xml)["bands"][0]["nodata"]
    assert nodata == 107.0
    assert mask_flags(arr, nodata=nodata) == GMF_NODATA
    assert checksum(mask_band(arr, nodata=nodata)) == 4209  # test_mask_2


def test_mask_3_alpha_stefan_rgba():
    from gdal_spark.functions.codecs import decode_image

    with open(os.path.join(GCORE, "stefan_full_rgba.png"), "rb") as fh:
        arr = decode_image(fh.read(), "png")
    assert arr.shape[2] == 4
    for b in (1, 2, 3):
        assert mask_flags(arr, b) == GMF_ALPHA + GMF_PER_DATASET
        assert checksum(mask_band(arr, b)) == 10807  # test_mask_3
    # the alpha band itself has an all-valid mask
    assert mask_flags(arr, 4) == GMF_ALL_VALID
    assert checksum(mask_band(arr, 4)) == 36074


def test_with_mask_stats_distributed(spark):
    from gdal_spark.functions.tiff import tiff_encode

    a = np.full((10, 10), 7, dtype=np.uint8)
    a[:3, :5] = 0  # 15 "nodata" pixels
    df = spark.createDataFrame(
        [("i0", bytearray(tiff_encode(a)), "tiff")],
        "image_id string, bytes binary, fmt string",
    )
    rows = with_mask_stats(df, nodata=0.0).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.flags == GMF_NODATA and abs(r.valid_frac - 0.85) < 1e-12
