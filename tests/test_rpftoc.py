"""RPFTOC driver + CADRG VQ frame decode vs the reference autotest
(autotest/gdrivers/rpftoc.py)."""

import os

import numpy as np
import pytest

from gdal_spark.functions.checksum import checksum
from gdal_spark.raster.rpftoc import (
    open_toc_entry,
    read_cadrg_frame,
    read_toc,
    toc_subdatasets,
)

D = "/root/reference/autotest/gdrivers/data"
TOC = os.path.join(D, "nitf", "A.TOC")

pytestmark = pytest.mark.skipif(
    not os.path.exists(TOC), reason="reference autotest data missing"
)


def test_rpftoc_subdatasets():
    """test_rpftoc_3: subdataset naming."""
    md = toc_subdatasets(TOC)
    assert md["SUBDATASET_1_NAME"] == \
        f"NITF_TOC_ENTRY:CADRG_ONC_1,000,000_2_0:{TOC}"


def test_rpftoc_entry():
    """test_rpftoc_1: single fully-masked CADRG frame -> constant 216
    mosaic (checksum 53599), TOC-origin + frame-resolution gt, 217-entry
    palette with nodata 216."""
    ds = open_toc_entry(f"NITF_TOC_ENTRY:CADRG_ONC_1,000,000_2_0:{TOC}")
    assert (ds.width, ds.height) == (1536, 1536)
    gt = ds.geotransform
    want = (1.9999416000000001, 0.0017833876302083334, 0.0,
            36.000117500000002, 0.0, -0.0013461816406249993)
    assert all(abs(a - b) < 1e-12 for a, b in zip(gt, want))
    assert ds.color_table_count == 217
    assert ds.nodata == 216
    assert checksum(ds.read()) == 53599  # reference: 53599
    md = ds.metadata()
    assert md["FILENAME_0"].endswith("RPFTOC01.ON2")


def test_rpftoc_rgba():
    """test_rpftoc_2: FORCE_RGBA mode — fully transparent frame gives
    four zero-checksum bands."""
    ds = open_toc_entry(f"NITF_TOC_ENTRY:CADRG_ONC_1,000,000_2_0:{TOC}")
    rgba = ds.read_rgba()
    assert rgba.shape == (1536, 1536, 4)
    assert [checksum(rgba[:, :, i]) for i in range(4)] == [0, 0, 0, 0]


def test_rpftoc_zone9():
    """test_rpftoc_zone9: polar entry must agree with the direct frame
    open on geotransform and pixel checksum."""
    toc9 = os.path.join(D, "rpftoc", "zone9", "RPF", "A.TOC")
    ds = open_toc_entry(f"NITF_TOC_ENTRY:CADRG_ONC_1M_9_0:{toc9}")
    frame_path = os.path.join(D, "rpftoc", "zone9", "RPF", "ZONE9",
                              "00027010.ON9")
    fr = read_cadrg_frame(open(frame_path, "rb").read())
    assert ds.geotransform == pytest.approx(fr["geotransform"])
    assert checksum(ds.read()) == checksum(fr["array"])


def test_rpftoc_frame_decode_details():
    """VQ machinery: fully-masked frame decodes to constant 216; the
    CADRG colormap has 216 RGB entries; coverage-section georef is
    edge-of-pixel."""
    fr = read_cadrg_frame(
        open(os.path.join(D, "nitf", "RPFTOC01.ON2"), "rb").read()
    )
    assert fr["array"].shape == (1536, 1536)
    assert int(fr["array"].min()) == 216 and int(fr["array"].max()) == 216
    assert fr["palette"].shape == (216, 3)
    gt = fr["geotransform"]
    assert abs(gt[0] - 1.9999416) < 1e-9


def test_rpftoc_boundary_parse():
    entries = read_toc(TOC)
    assert len(entries) == 1
    e = entries[0]
    assert e["type"] == "CADRG"
    assert e["scale"] == "1,000,000"
    assert e["zone"] == "2"
    assert e["series"][0] == "ONC"
    assert (e["n_vert_frames"], e["n_horiz_frames"]) == (1, 1)
    assert list(e["frames"]) == [(0, 0)]
    assert e["frames"][(0, 0)]["exists"]
