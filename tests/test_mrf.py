"""MRF driver vs the reference autotest (autotest/gdrivers/mrf.py):
static fixture checksums, the overview ByFour kernels across all seven
data types, partial-block and implicit-level cascades, and the LERC
(Lerc1 + Lerc2) decoders."""

import os

import numpy as np
import pytest

from gdal_spark.functions.checksum import checksum
from gdal_spark.functions.tiff import tiff_parse
from gdal_spark.raster.mrf import (
    average_by_four, build_mrf_overviews, mrf_info, mrf_read, mrf_write,
    near_by_four, scan_mrf_pages,
)

D = "/root/reference/autotest/gdrivers/data/mrf"
BYTE_TIF = "/root/reference/autotest/gcore/data/byte.tif"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(D), reason="reference autotest data missing"
)


def _byte():
    arr = tiff_parse(open(BYTE_TIF, "rb").read())[0]
    return arr[:, :, 0] if arr.ndim == 3 else arr


@pytest.mark.parametrize("sub", ["none", "deflate", "png", "tif",
                                 "lerc", "lerc_v1"])
def test_mrf_fixture_lossless(sub):
    # all six encode gcore byte.tif -> canonical checksum 4672
    arr, info = mrf_read(os.path.join(D, sub, "byte.mrf"))
    assert arr.shape == (20, 20, 1)
    assert checksum(arr[:, :, 0].astype("u1")) == 4672
    assert info["gt"] == (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
    assert "26711" in info["projection"]


def test_mrf_fixture_jpeg():
    # lossy page: PSNR gate vs byte.tif + the libjpeg-exact checksum
    arr, _ = mrf_read(os.path.join(D, "jpeg", "byte.mrf"))
    a = arr[:, :, 0].astype(np.float64)
    b = _byte().astype(np.float64)
    mse = ((a - b) ** 2).mean()
    psnr = 10 * np.log10(255.0 ** 2 / mse)
    assert psnr >= 30.0  # Q85 on noisy imagery; lossless gate is above
    assert checksum(arr[:, :, 0]) == 4668  # our libjpeg-exact decode


@pytest.mark.parametrize("dt", ["u1", "i2", "u2", "i4", "u4", "f4",
                                "f8"])
def test_mrf_overview_kernels(tmp_path, dt):
    # autotest expected checksums: NNB 1087 / NNB+nodata 1117 /
    # AVG 1152 / AVG+nodata 1164 for every data type
    a = _byte().astype(dt)
    p = str(tmp_path / "o.mrf")
    for resamp, nodata, exp in [("NNB", None, 1087), ("NNB", 107, 1117),
                                ("AVG", None, 1152), ("AVG", 107, 1164)]:
        mrf_write(a, p, compression="NONE", blocksize=10,
                  uniform_scale=2, nodata=nodata)
        build_mrf_overviews(p, resamp)
        cs = checksum(mrf_read(p, 1)[0][:, :, 0])
        assert cs == exp, (dt, resamp, nodata, cs)


def test_mrf_overview_partial_block(tmp_path):
    p = str(tmp_path / "p.mrf")
    mrf_write(_byte(), p, compression="NONE", blocksize=8,
              uniform_scale=2)
    build_mrf_overviews(p, "NNB")
    assert checksum(mrf_read(p, 1)[0][:, :, 0]) == 1087


def test_mrf_overview_implicit_level(tmp_path):
    # BLOCKSIZE=4 -> levels 10x10 / 5x5 / 3x3; the NNB cascade fills
    # the implicit last level (autotest expected_cs 93)
    p = str(tmp_path / "i.mrf")
    mrf_write(_byte(), p, compression="NONE", blocksize=4,
              uniform_scale=2)
    build_mrf_overviews(p, "NNB")
    info = mrf_info(p)
    assert [lv[:2] for lv in info["levels"]] == \
        [(20, 20), (10, 10), (5, 5), (3, 3)]
    assert checksum(mrf_read(p, 3)[0][:, :, 0]) == 93


@pytest.mark.parametrize("comp", ["NONE", "DEFLATE", "PNG"])
def test_mrf_roundtrip(tmp_path, comp):
    a = _byte()
    p = str(tmp_path / "rt.mrf")
    mrf_write(a, p, compression=comp, blocksize=16,
              bbox=(440720.0, 3750120.0, 441920.0, 3751320.0),
              projection="EPSG:26711")
    out, info = mrf_read(p)
    assert np.array_equal(out[:, :, 0], a)
    assert info["gt"] == (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)


def test_mrf_roundtrip_nbo_int16(tmp_path):
    a = (_byte().astype("i2") - 100)
    p = str(tmp_path / "nbo.mrf")
    mrf_write(a, p, compression="DEFLATE", blocksize=16, nbo=True)
    out, info = mrf_read(p)
    assert info["nbo"] is True
    assert np.array_equal(out[:, :, 0], a)


def test_lerc2_lut_and_mask_paths():
    # Lerc2 fixture exercises huffman/tiles; force the nodata unmask
    from gdal_spark.raster.lerc import lerc_decode
    blob = open(os.path.join(D, "lerc", "byte.lrc"), "rb").read()
    arr, meta = lerc_decode(blob, nodata=255)
    assert meta["w"] == 512 and meta["h"] == 512
    assert checksum(np.rint(arr[:20, :20, 0]).astype("u1")) == 4672


@pytest.mark.spark
def test_scan_mrf_pages_distributed(spark, tmp_path):
    a = _byte()
    p = str(tmp_path / "s.mrf")
    mrf_write(a, p, compression="DEFLATE", blocksize=8)
    rows = scan_mrf_pages(spark, p).collect()
    assert len(rows) == 9  # 3x3 pages
    total = sum(r.psum for r in rows)
    assert total == float(a.sum())
