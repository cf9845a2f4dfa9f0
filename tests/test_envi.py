"""ENVI driver vs the reference autotest (autotest/gdrivers/envi.py)."""

import os

import numpy as np
import pytest

from gdal_spark.functions.checksum import checksum
from gdal_spark.raster.envi import (
    envi_decode, envi_encode, envi_parse_header, envi_stats_decode,
)

ED = "/root/reference/autotest/gdrivers/data/envi"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(ED), reason="reference autotest data not present"
)


def _read(name, mode="rb"):
    with open(os.path.join(ED, name), mode) as fh:
        return fh.read()


def _hdr(name):
    return _read(name, "r")


def test_envi_1_aea():
    arr, meta = envi_decode(_hdr("aea.hdr"), _read("aea.dat"))
    assert checksum(arr) == 14823
    assert meta["gt"] == pytest.approx(
        (-936408.178, 28.5, 0.0, 2423902.344, 0.0, -28.5))
    assert meta["sensor_type"] == "Landsat TM"


def test_envi_compressed():
    # file compression = 1 -> gzip stream, same pixels as aea.dat
    arr, _ = envi_decode(_hdr("aea_compressed.hdr"),
                         _read("aea_compressed.dat"))
    assert checksum(arr) == 14823


@pytest.mark.parametrize(
    "suffix,interleave",
    [("bil", "BIL"), ("bip", "BIP"), ("bsq", "BSQ")],
)
def test_envi_interleaving(suffix, interleave):
    arr, meta = envi_decode(_hdr(f"envi_rgbsmall_{suffix}.hdr"),
                            _read(f"envi_rgbsmall_{suffix}.img"))
    assert meta["interleave"] == interleave
    assert checksum(arr[:, :, 0]) == 20718
    assert checksum(arr[:, :, 1]) == 20669
    assert checksum(arr[:, :, 2]) == 20895


def test_envi_bigendian():
    arr, _ = envi_decode(_hdr("uint16_envi_bigendian.hdr"),
                         _read("uint16_envi_bigendian.dat"))
    assert arr.dtype == np.uint16
    assert checksum(arr) == 4672


def test_envi_truncated():
    # test_envi_truncated (#915): byte.tif copied to ENVI then cut in half
    from gdal_spark.functions.tiff import tiff_parse
    src, _ = tiff_parse(
        open("/root/reference/autotest/gcore/data/byte.tif", "rb").read())
    hdr, body = envi_encode(src.astype(np.uint8))
    arr, _ = envi_decode(hdr, body[: 20 * 20 // 2])
    assert checksum(arr) == 2315


def test_envi_10_rpc():
    _, meta = envi_decode(_hdr("envirpc.hdr"), _read("envirpc.img"))
    assert meta["rpc"]["HEIGHT_OFF"] == 3355
    assert meta["rpc"]["LINE_OFF"] == pytest.approx(842.94998)
    assert len(meta["rpc"]["SAMP_DEN_COEFF"]) == 20


def test_envi_11_stats():
    hdr = envi_parse_header(_hdr("envistat.hdr"))
    stats = envi_stats_decode(_read("envistat.sta"), int(hdr["bands"]))
    assert stats[0] == pytest.approx((1.0, 3.0, 2.0, 0.5))


def test_envi_12_classes():
    _, meta = envi_decode(_hdr("testenviclasses.hdr"),
                          _read("testenviclasses"))
    assert meta["class_names"] == ["Black", "White"]
    assert meta["color_table"] == [(0, 0, 0, 255), (255, 255, 255, 255)]
    # writer round-trip keeps categories
    hdr2, body2 = envi_encode(np.zeros((1, 1), np.uint8),
                              class_names=meta["class_names"],
                              color_table=meta["color_table"])
    _, meta2 = envi_decode(hdr2, body2)
    assert meta2["class_names"] == ["Black", "White"]
    assert meta2["color_table"][0] == (0, 0, 0, 255)


def test_envi_gcp_roundtrip():
    # test_envi_gcp (#1528): 1-based storage, (Y, X) order
    hdr, body = envi_encode(np.zeros((1, 1), np.uint8))
    hdr += "geo points = {\n 2, 3, 4, 3}\n"
    _, meta = envi_decode(hdr, body)
    gcp = meta["gcps"][0]
    assert gcp["pixel"] == 1 and gcp["line"] == 2
    assert gcp["x"] == 3 and gcp["y"] == 4


def test_envi_rotation_map_info():
    # rotation.hdr: rotation=-66 around a UTM anchor
    hdr = envi_parse_header(_hdr("rotation.hdr"))
    assert hdr["interleave"] == "bip"
    arr, meta = envi_decode(_hdr("rotation.hdr"), _read("rotation.img"))
    gt = meta["gt"]
    import math
    rot = math.radians(66.0)
    assert gt[1] == pytest.approx(math.cos(rot) * 2.7)
    assert gt[2] == pytest.approx(-math.sin(rot) * 2.7)


def test_envi_rotation_180_roundtrip():
    # test_envi_rotation_180: south-up gt survives the writer
    hdr, body = envi_encode(np.zeros((1, 1), np.uint8), gt=(0, 10, 0, 0, 0, 10))
    _, meta = envi_decode(hdr, body)
    assert meta["gt"] == pytest.approx((0, 10, 0, 0, 0, 10))


def test_envi_create_rgb_roundtrip():
    # test_envi_3 shape: rgbsmall band 2 checksum 21053 through the writer
    from gdal_spark.functions.tiff import tiff_parse
    src, _ = tiff_parse(
        open("/root/reference/autotest/gcore/data/rgbsmall.tif", "rb").read())
    for il in ("bsq", "bil", "bip"):
        hdr, body = envi_encode(src, interleave=il)
        back, _ = envi_decode(hdr, body)
        assert checksum(back[:, :, 1]) == 21053, il
        assert np.array_equal(back, src)


def test_envi_nodata_roundtrip():
    hdr, body = envi_encode(np.ones((2, 2), np.float32), nodata=1.0)
    _, meta = envi_decode(hdr, body)
    assert meta["nodata"] == 1.0
