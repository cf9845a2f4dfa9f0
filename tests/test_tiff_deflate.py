"""Deflate (+ predictor 2) TIFF/COG write paths (frmts/gtiff
COMPRESS=DEFLATE / PREDICTOR=2) and reader parity on the reference's
own old-style-deflate fixture."""

from __future__ import annotations

import os

import numpy as np
import pytest

from gdal_spark.functions.tiff import TiffError, tiff_encode, tiff_parse
from gdal_spark.raster.cog import cog_info, read_cog_level, write_cog


def _textured(shape, seed=1):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 64, size=shape, dtype=np.uint8)
    ramp = (np.mgrid[0:shape[0], 0:shape[1]][0] * 3 % 191).astype(np.uint8)
    return (base + (ramp[..., None] if len(shape) == 3 else ramp)).astype(
        np.uint8)


@pytest.mark.parametrize("shape", [(37, 53), (40, 60, 3), (64, 64)])
@pytest.mark.parametrize("comp,pred", [
    ("deflate", 1), ("deflate", 2), ("lzw", 2)])
def test_tiff_deflate_predictor_roundtrip(shape, comp, pred):
    arr = _textured(shape)
    buf = tiff_encode(arr, compression=comp, predictor=pred)
    back, meta = tiff_parse(buf)
    np.testing.assert_array_equal(back.squeeze(), arr)
    assert meta["compression"] == (8 if comp == "deflate" else 5)


def test_deflate_compresses_and_predictor_helps():
    gy, gx = np.mgrid[0:64, 0:64]
    arr = (gy + gx).astype(np.uint8)  # smooth gradient
    n = len(tiff_encode(arr))
    d = len(tiff_encode(arr, compression="deflate"))
    d2 = len(tiff_encode(arr, compression="deflate", predictor=2))
    assert d < n and d2 < d


def test_predictor_requires_lzw_or_deflate():
    arr = _textured((16, 16))
    with pytest.raises(TiffError):
        tiff_encode(arr, compression="packbits", predictor=2)
    with pytest.raises(TiffError):
        tiff_encode(arr, compression="deflate", predictor=3)


@pytest.mark.parametrize("pred", [1, 2])
def test_cog_deflate_roundtrip(pred):
    rng = np.random.default_rng(5)
    rgb = rng.integers(0, 256, size=(300, 260, 3), dtype=np.uint8)
    cog = write_cog(rgb, compress="deflate", predictor=pred)
    info = cog_info(cog)
    assert info["levels"][0]["compression"] == 8
    assert info["levels"][0]["predictor"] == pred
    np.testing.assert_array_equal(read_cog_level(cog, 0).squeeze(), rgb)
    # overview level decodes too
    ov = read_cog_level(cog, 1)
    assert ov.shape[0] == 150 and ov.shape[1] == 130


_BUG4468 = "/root/reference/autotest/gcore/data/bug4468.tif"


@pytest.mark.skipif(not os.path.exists(_BUG4468),
                    reason="autotest data missing")
def test_reference_old_deflate_predictor2_checksum():
    """bug4468.tif: COMPRESSION=32946 (old-style Deflate) + PREDICTOR=2,
    4-band uint8; band-1 checksum 2923 is the reference's own expected
    value (gcore/tiff_write.py test_tiff_write_105)."""
    from gdal_spark.functions.checksum import checksum_image

    arr, meta = tiff_parse(open(_BUG4468, "rb").read())
    assert meta["compression"] == 32946
    assert int(checksum_image(arr)[0]) == 2923
