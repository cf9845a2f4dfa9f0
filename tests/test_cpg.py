"""CPG driver vs the reference autotest (autotest/gdrivers/cpg.py) plus
synthetic polgasp/type-1 coverage."""

import os
import struct

import numpy as np
import pytest

from gdal_spark.functions.checksum import checksum
from gdal_spark.raster.cpg import cpg_open

D = "/root/reference/autotest/gdrivers/data/cpg"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(D), reason="reference autotest data missing"
)


def test_sirc_open():
    """test_cpg_1: 1x1 SIRC fileset, band 1 checksum 0."""
    ds = cpg_open(os.path.join(D, "fakecpgSIRC.hdr"))
    assert (ds.width, ds.height, ds.band_count) == (1, 1, 4)
    assert ds.metadata["MATRIX_REPRESENTATION"] == "SCATTERING"
    assert ds.band_metadata[0]["POLARIMETRIC_INTERP"] == "hh"
    b = ds.read_band(1)
    assert b.dtype == np.complex64
    assert checksum(b.real) == 0
    # 5 geo params in the header -> 16 pseudo-geocoding GCPs
    assert len(ds.gcps) == 16
    # gcp 16 (transposed=0): pixel=nsamples, line=nlines
    g = ds.gcps[15]
    assert (g["pixel"], g["line"]) == (1.0, 1.0)
    t = 0.01 + 0.01 * 1.0
    assert g["x"] == pytest.approx((t * t - 0.01 * 0.01) ** 0.5)


def test_sirc_decode_formula(tmp_path):
    """Non-zero CCP payload: scale = sqrt((b2/254+1.5)*2^b1)/127."""
    hdr = tmp_path / "fakeSIRC.hdr"
    hdr.write_text("number_lines 1\nnumber_samples 2\n")
    px = [
        [2, 10, 30, -40, 5, 6, 7, 8, 9, 10],
        [-1, 50, -60, 70, 1, 2, 3, 4, 5, 6],
    ]
    raw = b"".join(b"".join(struct.pack("b", v) for v in p) for p in px)
    (tmp_path / "fakeSIRC.img").write_bytes(raw)
    ds = cpg_open(str(hdr))
    for band in range(1, 5):
        got = ds.read_band(band)
        for i, p in enumerate(px):
            scale = ((p[1] / 254.0 + 1.5) * 2.0 ** p[0]) ** 0.5 / 127.0
            want = complex(p[2 * band] * scale, p[2 * band + 1] * scale)
            assert got[0, i] == pytest.approx(want, rel=1e-6), (band, i)


def test_polgasp_type1(tmp_path):
    """Four-file hh/hv/vv/vh CFloat32 fileset + UTM georeferencing."""
    w, h = 3, 2
    for i, pol in enumerate(("hh", "hv", "vv", "vh")):
        vals = (np.arange(w * h * 2) + i * 100).astype(">f4")
        (tmp_path / f"x_sso_{pol}.img").write_bytes(vals.tobytes())
        (tmp_path / f"x_sso_{pol}.hdr").write_text(
            f"number_lines {h}\n"
            f"number_samples {w}\n"
            "reference north 5000000\n"
            "reference east 400000\n"
            "reference projection UTM zone 17\n"
            "reference corner Upper_Left\n"
            "sample_size 5\n"
            "sample_size_az 4\n"
            "transposed 0\n")
    ds = cpg_open(str(tmp_path / "x_sso_hh.img"))
    assert (ds.width, ds.height) == (w, h)
    assert ds.geotransform == (400000.0, 4.0, 0.0, 5000000.0, 0.0, -5.0)
    assert ds.utm_zone == (17, "N")
    b2 = ds.read_band(2)
    assert b2[0, 0] == pytest.approx(100 + 101j)
    assert b2[1, 2] == pytest.approx(110 + 111j)
