"""gdalcompare equivalent — check-ladder semantics of the reference's
osgeo_utils/gdalcompare.py on engine-encoded fixtures + the reference's
own byte.tif."""

from __future__ import annotations

import numpy as np

from gdal_spark.functions.tiff import tiff_encode
from gdal_spark.raster.compare import compare_images, compare_tables


def _img(h=40, w=50, seed=2):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w), dtype=np.uint8)


def test_identical_files_zero_diffs():
    a = tiff_encode(_img())
    assert compare_images(a, a) == {
        "found_diff": 0, "findings": [], "max_diff": 0.0,
        "pixels_differing": 0,
    }


def test_single_pixel_difference():
    img = _img()
    mod = img.copy()
    mod[13, 17] += 7
    c = compare_images(tiff_encode(img), tiff_encode(mod))
    assert c["found_diff"] == 1
    assert c["pixels_differing"] == 1
    assert c["max_diff"] == 7.0
    assert "Band 1 checksum difference" in c["findings"][0]


def test_size_and_band_mismatch_short_circuit():
    a = tiff_encode(_img(40, 50))
    b = tiff_encode(_img(40, 51))
    c = compare_images(a, b)
    assert c["found_diff"] == 1 and "Size mismatch" in c["findings"][0]
    rgb = np.dstack([_img()] * 3)
    c2 = compare_images(tiff_encode(_img()), tiff_encode(rgb))
    assert any("Band count" in f for f in c2["findings"])


def test_cross_format_same_pixels_is_clean():
    """png of the same array compares clean against tiff (the ladder
    compares decoded pixels, not containers)."""
    from gdal_spark.functions.codecs import encode_image

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (40, 50, 3), dtype=np.uint8)
    c = compare_images(tiff_encode(img), encode_image(img, "png"),
                       golden_fmt="tiff", new_fmt="png")
    assert c["found_diff"] == 0


def test_geotransform_mismatch():
    img = _img()
    a = tiff_encode(img, geotransform=(0.0, 1.0, 0.0, 10.0, 0.0, -1.0))
    b = tiff_encode(img, geotransform=(0.0, 1.0, 0.0, 20.0, 0.0, -1.0))
    c = compare_images(a, b)
    assert any("Geotransform" in f for f in c["findings"])


def test_reference_byte_tif_self_compare():
    with open("/root/reference/autotest/gcore/data/byte.tif", "rb") as fh:
        data = fh.read()
    assert compare_images(data, data)["found_diff"] == 0


def test_compare_tables_distributed(spark):
    imgs = {f"i{k}": _img(seed=k) for k in range(4)}
    golden = spark.createDataFrame(
        [(k, bytearray(tiff_encode(v)), "tiff") for k, v in imgs.items()],
        "image_id string, bytes binary, fmt string",
    )
    mod = {k: v.copy() for k, v in imgs.items()}
    mod["i2"][0, 0] ^= 255  # plant one regression
    cand = spark.createDataFrame(
        [(k, bytearray(tiff_encode(v)), "tiff") for k, v in mod.items()],
        "image_id string, bytes binary, fmt string",
    )
    rows = {r.image_id: r for r in compare_tables(golden, cand).collect()}
    assert len(rows) == 4
    assert rows["i2"].found_diff == 1 and rows["i2"].pixels_differing == 1
    assert all(rows[k].found_diff == 0 for k in ("i0", "i1", "i3"))


def test_cog_roundtrip_via_codec_registry():
    """fmt="cog" in the codec registry: encode -> valid COG -> decode."""
    from gdal_spark.functions.codecs import decode_image, encode_image
    from gdal_spark.raster.cog import validate_cog

    img = _img(300, 280, seed=8)
    blob = encode_image(img, "cog")
    assert validate_cog(blob) == []
    assert np.array_equal(decode_image(blob, "cog"), img)
    assert compare_images(tiff_encode(img), blob,
                          new_fmt="cog")["found_diff"] == 0
