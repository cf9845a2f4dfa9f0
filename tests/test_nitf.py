"""NITF driver parity — autotest/gdrivers/nitf.py expectations on the
reference's own .ntf fixtures plus writer roundtrips through the
engine's checksum (GDALChecksumImage port)."""

import numpy as np
import pytest

from gdal_spark.functions.checksum import checksum
from gdal_spark.functions.tiff import tiff_decode
from gdal_spark.raster.nitf import nitf_encode, parse_file_header, read_nitf

NITF = "/root/reference/autotest/gdrivers/data/nitf"
GCORE = "/root/reference/autotest/gcore/data"


class TestReadParity:
    def test_1bit_checksum_170(self):
        """test_nitf_11 / nitf_38 family: 1-bit NC, canonical cs 170."""
        for name in ("i_3034c.ntf", "ns3034d.nsf", "i_3034f.ntf"):
            a = read_nitf(open(f"{NITF}/{name}", "rb").read())[0]["array"]
            assert a.shape == (18, 35, 1)
            assert checksum(a[:, :, 0]) == 170, name

    def test_rgb_is_rgbsmall_bit_exact(self):
        """rgb.ntf decodes to rgbsmall.tif's exact band checksums
        (21212/21053/21349 — test_nitf_3's createcopy value is band 3)."""
        a = read_nitf(open(f"{NITF}/rgb.ntf", "rb").read())[0]["array"]
        assert [checksum(a[:, :, i]) for i in range(3)] == [
            21212, 21053, 21349,
        ]
        twin = tiff_decode(open(f"{GCORE}/rgbsmall.tif", "rb").read())
        assert (a == twin).all()

    def test_no_image_segments(self):
        """test_nitf_12: U_0006A.NTF has no image segment."""
        imgs = read_nitf(open(f"{NITF}/U_0006A.NTF", "rb").read())
        assert imgs == []

    def test_nitf_1x_rejected(self):
        """test_nitf_20: NITF 1.1 file -> open fails."""
        with pytest.raises(ValueError):
            read_nitf(open(f"{NITF}/U_0002A.NTF", "rb").read())

    def test_compressed_surfaced_not_decoded(self):
        """U_1050A.NTF is C1 bilevel: header parses, array is None."""
        imgs = read_nitf(open(f"{NITF}/U_1050A.NTF", "rb").read())
        assert imgs[0]["ic"] == "C1" and imgs[0]["array"] is None

    def test_segment_ladder(self):
        fh = parse_file_header(open(f"{NITF}/rgb.ntf", "rb").read())
        ims = [s for s in fh["segments"] if s["type"] == "IM"]
        assert len(ims) == 1
        assert ims[0]["size"] == 50 * 50 * 3


class TestWriter:
    def test_byte_roundtrip_4672(self):
        """test_nitf_1: byte.tif createcopy roundtrip, cs 4672."""
        arr = tiff_decode(open(f"{GCORE}/byte.tif", "rb").read())
        back = read_nitf(nitf_encode(arr.squeeze()))[0]
        assert back["imode"] == "B" and back["ic"] == "NC"
        assert checksum(back["array"][:, :, 0]) == 4672

    def test_int16_roundtrip_4672(self):
        """test_nitf_2: int16.tif, cs 4672."""
        arr = tiff_decode(open(f"{GCORE}/int16.tif", "rb").read())
        back = read_nitf(nitf_encode(arr.squeeze().astype(np.int16)))[0]
        assert back["pvtype"] == "SI" and back["nbpp"] == 16
        assert checksum(back["array"][:, :, 0]) == 4672

    def test_rgb_roundtrip_pixel_interleaved(self):
        """test_nitf_3: rgbsmall RGB, band-3 cs 21349, IMODE P."""
        arr = tiff_decode(open(f"{GCORE}/rgbsmall.tif", "rb").read())
        back = read_nitf(nitf_encode(arr))[0]
        assert back["imode"] == "P" and back["irep"] == "RGB"
        assert (back["array"] == arr).all()
        assert checksum(back["array"][:, :, 2]) == 21349

    def test_float32_roundtrip(self):
        rng = np.random.default_rng(3)
        arr = rng.random((9, 13)).astype(np.float32)
        back = read_nitf(nitf_encode(arr))[0]["array"]
        assert (back[:, :, 0] == arr).all()

    def test_codec_registry(self):
        from gdal_spark.functions.codecs import decode_image, encode_image

        arr = (np.arange(64, dtype=np.uint8).reshape(8, 8) * 3) % 251
        assert (decode_image(encode_image(arr, "nitf"), "nitf") == arr).all()
