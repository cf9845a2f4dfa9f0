"""USGS DEM driver parity — autotest/gdrivers/usgsdem.py checksums and
geotransforms on the reference's own fixtures (all eight)."""

import numpy as np

from gdal_spark.functions.checksum import checksum
from gdal_spark.raster.usgsdem import read_usgsdem, usgsdem_encode

D = "/root/reference/autotest/gdrivers/data/usgsdem"

CASES = [
    ("022gdeme_truncated", 1583),
    ("114p01_0100_deme_truncated.dem", 53864),
    ("39079G6_truncated.dem", 61424),
    ("39109h1_truncated.dem", 39443),
    ("4619old_truncated.dem", 10659),
    ("usgsdem_with_extra_values_at_end_of_profile.dem", 56679),
    ("usgsdem_with_spaces_after_byte_864.dem", 61078),
    ("record_1025_ending_with_linefeed.dem", 14172),
]


def test_all_fixture_checksums():
    for name, cs in CASES:
        h = read_usgsdem(open(f"{D}/{name}", "rb").read())
        assert checksum(h["array"]) == cs, name


def test_geographic_geotransform_and_datum():
    """test_usgsdem_1: NAD27 geographic, arc-second corners."""
    h = read_usgsdem(open(f"{D}/022gdeme_truncated", "rb").read())
    gt = h["gt"]
    assert abs(gt[0] - (-67.00041667)) < 1e-6
    assert abs(gt[1] - 0.00083333) < 1e-6
    assert abs(gt[3] - 50.000416667) < 1e-6
    assert h["datum"] == "NAD27"


def test_utm_918_header_geotransform():
    """test_usgsdem_with_header_of_918_bytes: NAD83 UTM15, x origin from
    the first profile."""
    h = read_usgsdem(
        open(f"{D}/fema06-140cm_2995441b_truncated.dem", "rb").read()
    )
    assert h["datum"] == "NAD83" and h["coord_sys"] == 1
    assert h["utm_zone"] == 15
    gt = h["gt"]
    assert gt == (248500.0, 1.4, 0.0, 3252508.7, 0.0, -1.4)
    assert h["array"].dtype == np.float32  # vres < 1


def test_float_type_selection():
    """39109h1: vres < 1 -> Float32, like the reference type rule."""
    h = read_usgsdem(open(f"{D}/39109h1_truncated.dem", "rb").read())
    assert h["array"].dtype == np.float32


def test_writer_roundtrip():
    rng = np.random.default_rng(9)
    arr = rng.integers(-400, 4000, size=(16, 16)).astype(np.int16)
    back = read_usgsdem(usgsdem_encode(arr))
    assert (back["array"] == arr).all()
    assert back["datum"] == "WGS84"
