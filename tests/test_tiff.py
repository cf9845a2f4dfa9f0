"""Baseline TIFF/GeoTIFF codec (frmts/gtiff parity surface) goldens."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from gdal_spark.functions import tiff as TF


def _gray(h=37, w=53, seed=0):
    return np.random.default_rng(seed).integers(0, 256, (h, w)).astype(np.uint8)


def _rgb(h=37, w=53, seed=1):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3)).astype(np.uint8)


class TestRoundtrip:
    @pytest.mark.parametrize("comp", ["none", "packbits", "lzw"])
    def test_gray(self, comp):
        a = _gray()
        out, meta = TF.tiff_parse(TF.tiff_encode(a, compression=comp))
        np.testing.assert_array_equal(out, a)
        assert (meta["width"], meta["height"]) == (53, 37)

    @pytest.mark.parametrize("comp", ["none", "packbits", "lzw"])
    def test_rgb(self, comp):
        a = _rgb()
        out, _ = TF.tiff_parse(TF.tiff_encode(a, compression=comp))
        np.testing.assert_array_equal(out, a)

    def test_multi_strip_boundaries(self):
        a = _gray(130, 41)
        out, _ = TF.tiff_parse(TF.tiff_encode(a, rows_per_strip=32))
        np.testing.assert_array_equal(out, a)

    def test_lzw_table_reset_stress(self):
        # > 4093 dictionary entries forces a mid-stream CLEAR
        a = np.random.default_rng(9).integers(0, 256, (200, 211)).astype(np.uint8)
        out, _ = TF.tiff_parse(TF.tiff_encode(a, compression="lzw"))
        np.testing.assert_array_equal(out, a)

    def test_lzw_compresses_runs(self):
        a = np.zeros((64, 64), np.uint8)
        raw = TF.tiff_encode(a, compression="none")
        lzw = TF.tiff_encode(a, compression="lzw")
        assert len(lzw) < len(raw) / 4

    def test_geotransform_roundtrip(self):
        gt = (-180.0, 0.1, 0.0, 85.0, 0.0, -0.1)
        buf = TF.tiff_encode(_gray(16, 16), geotransform=gt)
        _, meta = TF.tiff_parse(buf)
        assert np.allclose(meta["geotransform"], gt)


class TestForeignLayouts:
    def test_big_endian_file(self):
        # hand-build a 2x2 gray MM (big-endian) file
        px = bytes([10, 20, 30, 40])
        entries = [
            (256, 3, 1, 2), (257, 3, 1, 2), (258, 3, 1, 8), (259, 3, 1, 1),
            (262, 3, 1, 1), (273, 4, 1, 8), (277, 3, 1, 1), (278, 4, 1, 2),
            (279, 4, 1, 4),
        ]
        ifd = struct.pack(">H", len(entries))
        for tag, typ, cnt, val in entries:
            if typ == 3:
                v4 = struct.pack(">H", val) + b"\0\0"
            else:
                v4 = struct.pack(">I", val)
            ifd += struct.pack(">HHI", tag, typ, cnt) + v4
        ifd += struct.pack(">I", 0)
        buf = struct.pack(">2sHI", b"MM", 42, 12) + px + ifd
        out, _ = TF.tiff_parse(buf)
        np.testing.assert_array_equal(out, [[10, 20], [30, 40]])

    def test_tiled_layout(self):
        # 4x4 image as four 2x2 uncompressed tiles
        tiles = [bytes([i] * 4) for i in (1, 2, 3, 4)]
        data_off = 8
        offs = [data_off + 4 * i for i in range(4)]
        entries = [
            (256, 4, 1, [4]), (257, 4, 1, [4]), (258, 3, 1, [8]),
            (259, 3, 1, [1]), (262, 3, 1, [1]), (277, 3, 1, [1]),
            (284, 3, 1, [1]), (322, 4, 1, [2]), (323, 4, 1, [2]),
        ]
        body = b"".join(tiles)
        over = struct.pack("<4I", *offs)
        over_off = data_off + len(body)
        entries.append((324, 4, 4, None))  # offsets -> overflow
        entries.append((325, 4, 4, [4, 4, 4, 4]))
        entries.sort(key=lambda e: e[0])
        ifd_off = over_off + len(over) + 16
        ifd = struct.pack("<H", len(entries))
        for tag, typ, cnt, vals in entries:
            if tag == 324:
                v4 = struct.pack("<I", over_off)
            elif tag == 325:
                v4 = struct.pack("<I", over_off + len(over))
            elif typ == 3:
                v4 = struct.pack("<H", vals[0]) + b"\0\0"
            else:
                v4 = struct.pack("<I", vals[0])
            ifd += struct.pack("<HHI", tag, typ, cnt) + v4
        ifd += struct.pack("<I", 0)
        buf = (
            struct.pack("<2sHI", b"II", 42, ifd_off)
            + body + over + struct.pack("<4I", 4, 4, 4, 4) + ifd
        )
        out, _ = TF.tiff_parse(buf)
        want = np.array(
            [[1, 1, 2, 2], [1, 1, 2, 2], [3, 3, 4, 4], [3, 3, 4, 4]], np.uint8
        )
        np.testing.assert_array_equal(out, want)

    def test_predictor2_strip(self):
        # row [5, 6, 6, 10] stored as diffs [5, 1, 0, 4]
        raw = bytes([5, 1, 0, 4])
        entries = [
            (256, 3, 1, 4), (257, 3, 1, 1), (258, 3, 1, 8), (259, 3, 1, 1),
            (262, 3, 1, 1), (273, 4, 1, 8), (277, 3, 1, 1), (278, 4, 1, 1),
            (279, 4, 1, 4), (317, 3, 1, 2),
        ]
        ifd = struct.pack("<H", len(entries))
        for tag, typ, cnt, val in entries:
            v4 = (struct.pack("<H", val) + b"\0\0") if typ == 3 else struct.pack("<I", val)
            ifd += struct.pack("<HHI", tag, typ, cnt) + v4
        ifd += struct.pack("<I", 0)
        buf = struct.pack("<2sHI", b"II", 42, 12) + raw + ifd
        out, _ = TF.tiff_parse(buf)
        np.testing.assert_array_equal(out, [[5, 6, 6, 10]])


class TestPrimitives:
    def test_packbits_roundtrip(self):
        rng = np.random.default_rng(2)
        for _ in range(20):
            n = int(rng.integers(1, 400))
            data = bytes(rng.integers(0, 4, n).astype(np.uint8))  # runs likely
            assert TF.packbits_decode(TF.packbits_encode(data), n) == data

    def test_lzw_roundtrip_various(self):
        rng = np.random.default_rng(4)
        for n in (1, 7, 255, 256, 257, 5000, 20000):
            data = bytes(rng.integers(0, 17, n).astype(np.uint8))
            assert TF.lzw_decode(TF.lzw_encode(data), n) == data

    def test_errors(self):
        with pytest.raises(TF.TiffError):
            TF.tiff_parse(b"XXXXXXXXXX")
        with pytest.raises(TF.TiffError):
            TF.tiff_encode(np.zeros((4, 4), np.float32))


class TestCodecRegistry:
    def test_dispatch(self):
        from gdal_spark.functions import codecs

        a = _rgb(24, 24)
        buf = codecs.encode_image(a, "tiff")
        np.testing.assert_array_equal(codecs.decode_image(buf, "tiff"), a)
        assert "tiff" in codecs.LOSSLESS
