"""NOAA L1B (AVHRR) driver vs the reference autotest
(autotest/gdrivers/l1b.py: test_l1b_little_endian and the truncated
POD fixture)."""

import os
import zipfile

import pytest

from gdal_spark.functions.checksum import checksum
from gdal_spark.raster.l1b import detect_l1b, read_l1b

D = "/root/reference/autotest/gdrivers/data/l1b"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(D), reason="reference autotest data missing"
)


def _little_endian_bytes():
    with zipfile.ZipFile(os.path.join(D, "hrpt_little_endian.l1b.zip")) as z:
        return z.read("hrpt_little_endian.l1b")


def test_l1b_little_endian():
    """autotest/gdrivers/l1b.py:272-279 — KLM NOHDR product with the
    byte-order flip heuristic, GRS80 GCP SRS, per-dataset mask."""
    data = _little_endian_bytes()
    assert detect_l1b(data, "hrpt_little_endian.l1b") == "noaa15_nohdr"
    r = read_l1b(data, "hrpt_little_endian.l1b")
    assert r["byte_order"] == "little"
    assert (r["width"], r["height"], r["nbands"]) == (2048, 2, 5)
    assert "GRS80" in r["gcp_srs"]
    assert checksum(r["bands"][0]) == 14145          # reference: 14145
    assert r["mask"] is not None
    assert checksum(r["mask"]) == 25115              # reference: 25115
    assert r["metadata"]["FORMAT"] == "UNPACKED16BIT"
    assert r["metadata"]["SATELLITE"] == "NOAA-19(N')"
    assert r["metadata"]["LOCATION"] == "Ascending"


def test_l1b_truncated_pod():
    """POD (NOAA-12) GAC 8-bit product truncated to zero scanlines:
    header metadata still parses, zero rows, no crash."""
    p = os.path.join(D, "n12gac8bit_truncated_ysize_0_1band.l1b")
    data = open(p, "rb").read()
    assert detect_l1b(data, os.path.basename(p)) == "noaa9"
    r = read_l1b(data, os.path.basename(p))
    assert (r["width"], r["height"], r["nbands"]) == (409, 0, 1)
    assert r["metadata"]["SATELLITE"] == "NOAA-12(D)"
    assert r["metadata"]["DATA_TYPE"] == "GAC"
    assert r["metadata"]["FORMAT"] == "UNPACKED8BIT"
    assert r["metadata"]["DATASET_NAME"].startswith("NSS.GHRR.ND.")


def test_l1b_gcps_little_endian():
    """GCPs scaled by 1e4 within lat/lon bounds, KLM gcp layout."""
    r = read_l1b(_little_endian_bytes(), "hrpt_little_endian.l1b")
    assert len(r["gcps"]) > 0
    for px, ln, x, y in r["gcps"]:
        assert -180 <= x <= 180 and -90 <= y <= 90
        assert 0 <= px <= r["width"] and 0 <= ln <= r["height"]


def test_identify_l1b():
    from gdal_spark.sources.identify import identify_driver

    data = _little_endian_bytes()
    assert identify_driver(data[:1024], "hrpt_little_endian.l1b") == "L1B"
    p = os.path.join(D, "n12gac8bit_truncated_ysize_0_1band.l1b")
    assert identify_driver(open(p, "rb").read(1024), p) == "L1B"
