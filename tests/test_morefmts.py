"""BMP / PNM / GIF codec round-trips (functions/morefmts.py).

Reference behaviors: frmts/bmp/bmpdataset.cpp (24bpp BI_RGB bottom-up,
8bpp palette), frmts/pnm/pnmdataset.cpp (P5/P6 binary, comment-tolerant
header), frmts/gif/gifdataset.cpp (GIF89a LZW, interlace, local color
tables).
"""

import struct

import numpy as np
import pytest

from gdal_spark.functions import morefmts as M


def _img(i: int, h: int = 37, w: int = 51) -> np.ndarray:
    rng = np.random.default_rng(1000 + i)
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


def _palette_img(i: int, h: int = 33, w: int = 47, ncol: int = 17) -> np.ndarray:
    rng = np.random.default_rng(2000 + i)
    pal = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
    idx = rng.integers(0, ncol, (h, w))
    return pal[idx]


@pytest.mark.parametrize("i", range(4))
def test_bmp_roundtrip(i):
    arr = _img(i, 23 + i, 40 + i)  # widths exercise all 4 padding cases
    back = M.bmp_decode(M.bmp_encode(arr))
    np.testing.assert_array_equal(back, arr)


def test_bmp_topdown_and_32bpp():
    arr = _img(9, 8, 5)
    # hand-build a top-down 32bpp BMP
    pix = np.dstack([arr[:, :, ::-1], np.zeros(arr.shape[:2], np.uint8)])
    off = 54
    data = (
        struct.pack("<2sIHHI", b"BM", off + pix.size, 0, 0, off)
        + struct.pack("<IiiHHIIiiII", 40, 5, -8, 1, 32, 0, pix.size, 0, 0, 0, 0)
        + pix.tobytes()
    )
    np.testing.assert_array_equal(M.bmp_decode(data), arr)


def test_bmp_8bpp_palette():
    arr = _palette_img(0, 11, 6, ncol=5)
    pal = np.unique(arr.reshape(-1, 3), axis=0)
    lut = {tuple(c): k for k, c in enumerate(pal)}
    idx = np.array([[lut[tuple(p)] for p in row] for row in arr], np.uint8)
    stride = (6 + 3) & ~3
    rows = np.zeros((11, stride), np.uint8)
    rows[:, :6] = idx[::-1]
    quads = np.zeros((len(pal), 4), np.uint8)
    quads[:, :3] = pal[:, ::-1]
    off = 54 + len(pal) * 4
    data = (
        struct.pack("<2sIHHI", b"BM", off + rows.size, 0, 0, off)
        + struct.pack("<IiiHHIIiiII", 40, 6, 11, 1, 8, 0, rows.size, 0, 0, len(pal), 0)
        + quads.tobytes()
        + rows.tobytes()
    )
    np.testing.assert_array_equal(M.bmp_decode(data), arr)


@pytest.mark.parametrize("i", range(3))
def test_pnm_roundtrip(i):
    arr = _img(10 + i)
    np.testing.assert_array_equal(M.pnm_decode(M.pnm_encode(arr)), arr)


def test_pnm_comments_and_p5():
    arr = _img(20, 4, 6)
    gray = arr[:, :, 0]
    data = b"P5\n# a comment\n6 4\n# another\n255\n" + gray.tobytes()
    back = M.pnm_decode(data)
    np.testing.assert_array_equal(back, np.repeat(gray[:, :, None], 3, axis=2))


@pytest.mark.parametrize("ncol", [2, 17, 255, 256])
def test_gif_exact_on_palette_images(ncol):
    arr = _palette_img(ncol, ncol=ncol)
    back = M.gif_decode(M.gif_encode(arr))
    np.testing.assert_array_equal(back, arr)


def test_gif_quantized_path():
    arr = _img(30, 64, 64)  # >256 distinct colors -> median-cut path
    back = M.gif_decode(M.gif_encode(arr))
    assert back.shape == arr.shape
    assert len(np.unique(back.reshape(-1, 3), axis=0)) <= 256
    # quantization error bounded: every output color is a palette color
    # chosen as nearest; mean abs error under the 5-bit histogram grid
    assert float(np.abs(back.astype(int) - arr.astype(int)).mean()) < 24.0


def test_gif_long_stream_code_widening():
    # enough distinct runs to push the LZW table past several width bumps
    # and through a 4096 clear/reset
    rng = np.random.default_rng(7)
    arr = _palette_img(3, 199, 211, ncol=256)
    back = M.gif_decode(M.gif_encode(arr))
    np.testing.assert_array_equal(back, arr)


def test_gif_interlaced_decode():
    arr = _palette_img(5, 29, 13, ncol=9)
    pal = np.unique(arr.reshape(-1, 3), axis=0)
    lut = {tuple(c): k for k, c in enumerate(pal)}
    idx = np.array([[lut[tuple(p)] for p in row] for row in arr], np.uint8)
    h, w = idx.shape
    order = np.concatenate(
        [np.arange(0, h, 8), np.arange(4, h, 8), np.arange(2, h, 4), np.arange(1, h, 2)]
    )
    ct_bits = 4
    ct = np.zeros((1 << ct_bits, 3), np.uint8)
    ct[: len(pal)] = pal
    min_code = ct_bits
    data = bytearray()
    data += b"GIF89a"
    data += struct.pack("<HHBBB", w, h, 0x80 | ((ct_bits - 1) << 4) | (ct_bits - 1), 0, 0)
    data += ct.tobytes()
    data += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0x40)  # interlaced
    data.append(min_code)
    data += M._subblocks(M._gif_lzw_encode(idx[order], min_code))
    data.append(0x3B)
    np.testing.assert_array_equal(M.gif_decode(bytes(data)), arr)


def test_registry_dispatch():
    from gdal_spark.functions import codecs

    arr = _palette_img(8, ncol=40)
    for fmt in ("bmp", "pnm", "gif"):
        back = codecs.decode_image(codecs.encode_image(arr, fmt), fmt)
        np.testing.assert_array_equal(back, arr)
    for fmt in ("bmp", "pnm"):
        assert fmt in codecs.LOSSLESS


# ---- TGA (frmts/tga/tgadataset.cpp) --------------------------------------


class TestTGA:
    def test_rle_roundtrip(self):
        import numpy as np

        from gdal_spark.functions.morefmts import tga_decode, tga_encode

        rng = np.random.default_rng(5)
        for shape in [(17, 23, 3), (1, 1, 3), (64, 64, 3)]:
            a = rng.integers(0, 256, shape, dtype=np.uint8)
            a[::3] = a[0, 0]  # runs, to exercise both packet kinds
            assert np.array_equal(tga_decode(tga_encode(a)), a)

    def test_rle_compresses_flat(self):
        import numpy as np

        from gdal_spark.functions.morefmts import tga_decode, tga_encode

        flat = np.full((32, 40, 3), 77, np.uint8)
        buf = tga_encode(flat)
        assert len(buf) < 32 * 40 * 3 / 10
        assert np.array_equal(tga_decode(buf), flat)

    def test_foreign_type2_bottom_up_32bit(self):
        import struct

        import numpy as np

        from gdal_spark.functions.morefmts import tga_decode

        rng = np.random.default_rng(6)
        h, w = 5, 4
        px = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
        head = struct.pack("<BBBHHBHHHHBB", 0, 0, 2, 0, 0, 0, 0, 0, w, h, 32, 0)
        raw = head + px[::-1][:, :, [2, 1, 0, 3]].tobytes()
        # 32-bit TGA keeps the alpha band (frmts/tga exposes 4 bands)
        assert np.array_equal(tga_decode(raw), px)

    def test_foreign_type1_colormapped(self):
        import struct

        import numpy as np

        from gdal_spark.functions.morefmts import tga_decode

        rng = np.random.default_rng(7)
        ct = rng.integers(0, 256, (7, 3), dtype=np.uint8)
        idx = rng.integers(0, 7, (6, 9), dtype=np.uint8)
        head = struct.pack("<BBBHHBHHHHBB", 0, 1, 1, 0, 7, 24, 0, 0, 9, 6, 8, 0)
        raw = head + ct[:, ::-1].tobytes() + idx[::-1].tobytes()
        assert np.array_equal(tga_decode(raw), ct[idx])

    def test_registry(self):
        import numpy as np

        from gdal_spark.functions import codecs

        a = np.full((8, 8, 3), 9, np.uint8)
        assert "tga" in codecs.LOSSLESS
        assert np.array_equal(
            codecs.decode_image(codecs.encode_image(a, "tga"), "tga"), a
        )
