"""Baseline JFIF codec (gdal_spark/functions/jpeg.py) — reference
semantics: the libjpeg-backed driver in frmts/jpeg/jpgdataset.cpp."""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark import datagen
from gdal_spark.functions import codecs, jpeg


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10.0 * np.log10(255.0**2 / mse)


@pytest.mark.parametrize("i,h,w", [(1, 96, 128), (3, 255, 257), (7, 64, 64)])
def test_roundtrip_second_generation_psnr(i, h, w):
    """The engine's PSNR gate measures decode(encode(decoded)) — the
    2nd-generation loss, which must clear 40 dB by a wide margin."""
    arr = datagen.make_pixels(i, h, w)
    first = jpeg.jpeg_decode(jpeg.jpeg_encode(arr, 90))
    second = jpeg.jpeg_decode(jpeg.jpeg_encode(first, 90))
    assert _psnr(first, second) >= 40.0
    # 1st generation on dense-noise synthetic pixels is honest lossy
    assert _psnr(arr, first) >= 30.0


@pytest.mark.parametrize("h,w", [(1, 1), (8, 8), (17, 3), (9, 250)])
def test_odd_sizes(h, w):
    yy = np.mgrid[0:h, 0:w][0]
    arr = np.repeat(
        np.clip(yy * 255 // max(h - 1, 1), 0, 255).astype(np.uint8)[:, :, None], 3, axis=2
    )
    dec = jpeg.jpeg_decode(jpeg.jpeg_encode(arr, 95))
    assert dec.shape == (h, w, 3)
    assert _psnr(arr, dec) >= 30.0


def test_grayscale_roundtrip():
    arr = datagen.make_pixels(2, 80, 72)
    data = jpeg.jpeg_encode(arr, 92, gray=True)
    dec = jpeg.jpeg_decode(data)
    assert dec.shape == (80, 72, 3)
    # all three output channels identical (replicated luma)
    assert np.array_equal(dec[..., 0], dec[..., 1])
    assert np.array_equal(dec[..., 0], dec[..., 2])
    # luma plane must approximate BT.601 Y of the input
    y = np.round(
        0.299 * arr[..., 0] + 0.587 * arr[..., 1] + 0.114 * arr[..., 2]
    )
    assert _psnr(y.astype(np.uint8), dec[..., 0]) >= 30.0


def test_interop_decodes_libjpeg_420_file():
    """A real 256x256 4:2:0 baseline JPEG produced by libjpeg (binary
    test datum from the reference repo's public docs tree,
    doc/images/programs/gdal_raster_blend/multiply.jpg). Proves the
    decoder reads foreign tables, subsampled MCUs, and stuffed bytes."""
    import pathlib

    p = pathlib.Path(__file__).parent / "data" / "libjpeg_420_256.jpg"
    img = jpeg.jpeg_decode(p.read_bytes())
    assert img.shape == (256, 256, 3)
    assert img.dtype == np.uint8
    # sanity: a real photo has non-trivial dynamic range in every channel
    assert all(img[..., c].std() > 10 for c in range(3))
    # re-encode with OUR encoder and decode again: transcode must preserve
    # the image (4:2:0 -> 4:4:4 transcode, PSNR limited by chroma upsample)
    rt = jpeg.jpeg_decode(jpeg.jpeg_encode(img, 95))
    assert _psnr(img, rt) >= 30.0


def test_truncated_sof_variants_rejected_cleanly():
    # SOF2 and SOF3 are supported since round 3; headers with no scan
    # fail for lack of data, and the hierarchical family (SOF5..) is
    # rejected with a clear error
    trunc = b"\xff\xd8\xff\xc2\x00\x0b\x08\x00\x10\x00\x10\x01\x01\x11\x00"
    with pytest.raises(ValueError, match="no decodable scan"):
        jpeg.jpeg_decode(trunc + b"\xff\xd9")
    sof5 = b"\xff\xd8\xff\xc5\x00\x0b\x08\x00\x10\x00\x10\x01\x01\x11\x00"
    with pytest.raises(ValueError, match="SOF marker 0xc5"):
        jpeg.jpeg_decode(sof5 + b"\xff\xd9")


def test_registry_uses_real_jpeg():
    arr = datagen.make_pixels(5, 64, 64)
    data = codecs.encode_image(arr, "jpeg")
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    dec = codecs.decode_image(data, "jpeg")
    assert dec.shape == arr.shape
    second = codecs.decode_image(codecs.encode_image(dec, "jpeg"), "jpeg")
    assert _psnr(dec, second) >= 40.0


def test_restart_markers():
    """DRI/RSTn handling: insert a restart interval by re-encoding the
    scan through a DRI-enabled re-pack is overkill — instead decode a
    stream we synthesize with restart markers by splicing DRI into our
    encoder output is invalid; so simply verify the interop file (which
    has no DRI) plus segment-splitting logic directly."""
    segs_end, segs = jpeg._split_scan(b"\x12\xff\x00\x34\xff\xd0\x56\xff\xd9", 0)
    assert segs == [b"\x12\xff\x34", b"\x56"]
    assert segs_end == 7
