"""DTED driver parity — autotest/gdrivers/dted.py expectations on the
reference's own n43.dt0 family."""

import numpy as np

from gdal_spark.functions.checksum import checksum
from gdal_spark.raster.dted import dted_encode, read_dted

DATA = "/root/reference/autotest/gdrivers/data"


def test_n43_checksum_and_gt():
    """test_dted_1 (cs 49187) + test_dted_2 (geotransform)."""
    h = read_dted(open(f"{DATA}/n43.dt0", "rb").read(),
                  verify_checksum=True)
    assert h["array"].shape == (121, 121)
    assert checksum(h["array"]) == 49187
    assert h["checksum_ok"]
    gt = h["gt"]
    assert abs(gt[0] - (-80.004166666666663)) < 1e-6
    assert abs(gt[1] - 0.0083333333333333332) < 1e-6
    assert abs(gt[3] - 44.00416666666667) < 1e-6
    assert abs(gt[5] - (-0.0083333333333333332)) < 1e-6


def test_coord_inverted_gt():
    """test_dted_14: MIL-D-89020 first-edition lat/long inversion is
    detected and fixed."""
    h = read_dted(open(f"{DATA}/dted/n43_coord_inverted.dt0", "rb").read())
    gt = h["gt"]
    assert abs(gt[0] - (-80.004166666666663)) < 1e-6
    assert abs(gt[3] - 44.00416666666667) < 1e-6


def test_bad_crc_detected():
    """test_dted_13(bad_crc): checksum verification flags the file."""
    h = read_dted(open(f"{DATA}/dted/n43_bad_crc.dt0", "rb").read(),
                  verify_checksum=True)
    assert not h["checksum_ok"]


def test_signed_magnitude_negative_values():
    rng = np.random.default_rng(5)
    arr = rng.integers(-500, 3000, size=(121, 121)).astype(np.int16)
    back = read_dted(dted_encode(arr), verify_checksum=True)
    assert (back["array"] == arr).all()
    assert back["checksum_ok"]


def test_truncated_columns_fill_nodata():
    arr = np.arange(121 * 121, dtype=np.int16).reshape(121, 121) % 3000
    data = dted_encode(arr)
    cut = data[: len(data) - 3 * (12 + 121 * 2)]
    h = read_dted(cut)
    assert (h["array"][:, :118] == arr[:, :118]).all()
    assert (h["array"][:, 118:] == -32767).all()


def test_codec_registry():
    from gdal_spark.functions.codecs import decode_image

    d = open(f"{DATA}/n43.dt0", "rb").read()
    assert checksum(decode_image(d, "dted")) == 49187
