"""BSB/KAP, GXF and SAGA drivers vs the reference's own autotest
checksums (autotest/gdrivers/{bsb,gxf,saga}.py)."""

import numpy as np
import pytest

from gdal_spark.functions import gridfmts as GF
from gdal_spark.functions.checksum import checksum
from gdal_spark.raster import bsb as B

BSB = "/root/reference/autotest/gdrivers/data/bsb"
GXF = "/root/reference/autotest/gdrivers/data/gxf"
SAGA = "/root/reference/autotest/gdrivers/data/saga"


def _read(path):
    with open(path, "rb") as fh:
        return fh.read()


# -- BSB ---------------------------------------------------------------------


@pytest.mark.parametrize(
    "name",
    ["rgbsmall.kap", "rgbsmall_index.kap", "rgbsmall_with_line_break.kap",
     "transverse_mercator.kap"],
)
def test_bsb_rgbsmall_checksum(name):
    # gdrivers/bsb.py: band 1 checksum 30321 (1-based indices shifted
    # down like bsbdataset.cpp IReadBlock)
    idx, pct = B.bsb_decode(_read(f"{BSB}/{name}"))
    assert idx.shape == (50, 50)
    assert checksum(idx) == 30321
    assert len(pct) >= 127


def test_bsb_australia4c():
    idx, pct = B.bsb_decode(_read(f"{BSB}/australia4c.kap"))
    assert idx.shape == (480, 625)
    assert len(pct) == 4


def test_bsb_truncated_fails():
    with pytest.raises(Exception):
        B.bsb_decode(_read(f"{BSB}/rgbsmall_truncated.kap"))


def test_bsb_roundtrip():
    idx, pct = B.bsb_decode(_read(f"{BSB}/rgbsmall.kap"))
    idx2, pct2 = B.bsb_decode(B.bsb_encode(idx, pct))
    assert np.array_equal(idx, idx2) and np.array_equal(pct, pct2)
    # long runs exercise the extended count encoding
    big = np.zeros((20, 3000), dtype=np.uint8)
    big[:, 1500:] = 5
    big[3, :] = 17
    pal = np.arange(60, dtype=np.uint8).reshape(20, 3)
    b2, p2 = B.bsb_decode(B.bsb_encode(big, pal))
    assert np.array_equal(big, b2) and np.array_equal(pal, p2)


# -- GXF ---------------------------------------------------------------------


def test_gxf_small_checksum():
    # gdrivers/gxf.py test_gxf_1: checksum 90 (GDT_Float32 band)
    arr, gt, nodata = GF.gxf_decode(_read(f"{GXF}/small.gxf"))
    assert arr.shape == (3, 4)
    assert checksum(arr.astype(np.float32)) == 90
    assert nodata is None  # small.gxf declares no #DUMMY


def test_gxf_small2_compressed_checksum():
    # test_gxf_2: base-90 compressed grid, checksum 65042
    arr, gt, nodata = GF.gxf_decode(_read(f"{GXF}/small2.gxf"))
    assert arr.shape == (8, 10)
    assert checksum(arr.astype(np.float32)) == 65042


def test_gxf_roundtrip():
    arr = np.arange(20, dtype=np.float64).reshape(4, 5) * 1.25 - 3
    gt = (100.0, 2.5, 0.0, 400.0, 0.0, -2.5)
    a2, gt2, nd = GF.gxf_decode(GF.gxf_encode(arr, gt, nodata=-999.0))
    assert np.array_equal(arr, a2)
    assert np.allclose(gt, gt2)
    assert nd == -999.0


# -- SAGA --------------------------------------------------------------------


def test_saga_4bytefloat_checksum():
    # gdrivers/saga.py: checksum 108
    arr, gt, nodata = GF.saga_decode(
        open(f"{SAGA}/4byteFloat.sgrd").read(),
        _read(f"{SAGA}/4byteFloat.sdat"),
    )
    assert arr.shape == (10, 10)
    assert checksum(arr.astype(np.float32)) == 108
    assert nodata == -99999.0


def test_saga_roundtrip():
    arr = (np.arange(42, dtype=np.float64).reshape(6, 7) % 9) * 0.5
    gt = (10.0, 1.5, 0.0, 50.0, 0.0, -1.5)
    hdr, sdat = GF.saga_encode(arr, gt, nodata=-7.0)
    a2, gt2, nd = GF.saga_decode(hdr, sdat)
    assert np.array_equal(arr, a2)
    assert np.allclose(gt, gt2)
    assert nd == -7.0
