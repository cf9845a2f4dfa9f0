"""DDS + CPHD readers vs reference autotest fixtures."""

from __future__ import annotations

import os
import struct

import numpy as np
import pytest

from gdal_spark.raster.cphd import cphd_open
from gdal_spark.raster.dds import (
    dds_decode,
    dds_encode_uncompressed,
)

DDS_FIX = ("/root/reference/autotest/gdrivers/data/dds/"
           "stefan_full_rgba_no_compression.dds")
TIF_FIX = "/root/reference/autotest/gcore/data/stefan_full_rgba.tif"
CPHD_FIX = "/root/reference/autotest/gdrivers/data/cphd/test.cphd"


@pytest.mark.skipif(not os.path.exists(DDS_FIX), reason="fixture missing")
def test_dds_uncompressed_matches_reference_tiff():
    """test_dds_no_compression: band checksums equal the source TIFF's."""
    from gdal_spark.functions.checksum import checksum
    from gdal_spark.functions.tiff import tiff_parse

    with open(DDS_FIX, "rb") as fh:
        arr, meta = dds_decode(fh.read())
    assert meta["compression"] == "NONE"
    with open(TIF_FIX, "rb") as fh:
        ref, _ = tiff_parse(fh.read())
    assert arr.shape == ref.shape
    for b in range(4):
        assert checksum(arr[:, :, b]) == checksum(ref[:, :, b])
        np.testing.assert_array_equal(arr[:, :, b], ref[:, :, b])


def test_dds_uncompressed_roundtrip():
    rng = np.random.default_rng(2)
    want = rng.integers(0, 255, (9, 13, 4)).astype(np.uint8)
    got, meta = dds_decode(dds_encode_uncompressed(want))
    np.testing.assert_array_equal(got, want)


def _dxt1_block(c565_0: int, c565_1: int, selectors) -> bytes:
    bits = 0
    for i, s in enumerate(selectors):
        bits |= s << (2 * i)
    return struct.pack("<HHI", c565_0, c565_1, bits)


def _dds(payload: bytes, w: int, h: int, fourcc: bytes) -> bytes:
    hdr = bytearray(128)
    hdr[0:4] = b"DDS "
    struct.pack_into("<5I", hdr, 4, 124, 0x000A1007, h, w, len(payload))
    struct.pack_into("<I", hdr, 76, 32)
    struct.pack_into("<I", hdr, 80, 0x4)  # DDPF_FOURCC
    hdr[84:88] = fourcc
    return bytes(hdr) + payload


def test_dxt1_four_color_mode():
    # endpoints red (0xF800) and blue (0x001F); c0 > c1 -> 4-color mode
    blk = _dxt1_block(0xF800, 0x001F, [0, 1, 2, 3] * 4)
    arr, meta = dds_decode(_dds(blk, 4, 4, b"DXT1"))
    assert meta["compression"] == "DXT1"
    np.testing.assert_array_equal(arr[0, 0], [255, 0, 0, 255])
    np.testing.assert_array_equal(arr[0, 1], [0, 0, 255, 255])
    # interpolants: 2/3 red + 1/3 blue and 1/3 red + 2/3 blue
    np.testing.assert_array_equal(arr[0, 2], [170, 0, 85, 255])
    np.testing.assert_array_equal(arr[0, 3], [85, 0, 170, 255])


def test_dxt1_transparent_mode():
    # c0 <= c1 -> 3-color mode; selector 3 is transparent black
    blk = _dxt1_block(0x001F, 0xF800, [3] * 16)
    arr, _ = dds_decode(_dds(blk, 4, 4, b"DXT1"))
    assert (arr[:, :, 3] == 0).all()


def test_dxt3_explicit_alpha():
    alpha = bytes([0x10, 0x32, 0x54, 0x76, 0x98, 0xBA, 0xDC, 0xFE])
    blk = alpha + _dxt1_block(0xFFFF, 0x0000, [0] * 16)
    arr, meta = dds_decode(_dds(blk, 4, 4, b"DXT3"))
    assert meta["compression"] == "DXT3"
    # nibbles scale by 17: 0,1,2,3... -> 0,17,34,51...
    np.testing.assert_array_equal(
        arr[0, :, 3], [0, 17, 34, 51])
    np.testing.assert_array_equal(arr[0, 0, :3], [255, 255, 255])


def test_dxt5_interpolated_alpha():
    # a0=255 > a1=0 -> 8-value ramp; selectors pick a0 then a1
    asel = 0
    for i, s in enumerate([0, 1, 2, 3, 4, 5, 6, 7] + [0] * 8):
        asel |= s << (3 * i)
    alpha = struct.pack("<BB", 255, 0) + asel.to_bytes(6, "little")
    blk = alpha + _dxt1_block(0x0000, 0xFFFF, [0] * 16)
    arr, meta = dds_decode(_dds(blk, 4, 4, b"DXT5"))
    assert meta["compression"] == "DXT5"
    want = [255, 0, (6 * 255 + 3) // 7, (5 * 255 + 3) // 7]
    np.testing.assert_array_equal(arr[0, :, 3], want)


def test_dxt_non_multiple_of_4():
    blk = _dxt1_block(0xF800, 0x001F, [0] * 16)
    arr, _ = dds_decode(_dds(blk * 1, 3, 2, b"DXT1"))
    assert arr.shape == (2, 3, 4)


@pytest.mark.skipif(not os.path.exists(CPHD_FIX), reason="fixture missing")
def test_cphd_fixture():
    """test_cphd_local expectations."""
    with open(CPHD_FIX, "rb") as fh:
        f = cphd_open(fh.read())
    assert f.attributes["cphd_version"] == "1.1.0"
    assert f.attributes["classification"] == "UNCLASSIFIED"
    assert f.attributes["collect_type"] == "MONOSTATIC"
    assert f.attributes["collector_name"] == "Synthetic"
    assert f.attributes["core_name"] == "SyntheticCore"
    assert f.attributes["radar_mode"] == "SPOTLIGHT"
    assert f.attributes["k"] == "V"
    assert f.xml.startswith("<CPHD ")

    assert len(f.channels) == 1
    ch = f.channels[0]
    assert ch["identifier"] == "1"
    assert (ch["num_vectors"], ch["num_samples"]) == (1, 1)
    assert ch["signal"].shape == (1, 1)
    assert ch["signal"][0, 0] == 0

    dt = f.pvp_dtype
    assert dt.itemsize == 360
    assert len(dt.names) == 25
    assert dt.names[0] == "TxTime"
    assert dt.fields["TxTime"][1] == 0
    assert dt.fields["TxPos"][1] == 8
    assert dt.fields["TxPos"][0].names == ("X", "Y", "Z")
    arr = ch["pvp"]
    assert arr["TxTime"][0] == 0
    assert arr["TxPos"][0]["X"] == 0
    assert arr["TxAntenna.TxACX"][0]["Z"] == 0
    assert arr["RcvAntenna.RcvEB"][0]["DCY"] == 0
    assert arr["MyPVP"][0] == 0


def test_cphd_rejects():
    with pytest.raises(ValueError):
        cphd_open(b"NOPE/1.0\n\f\n")
