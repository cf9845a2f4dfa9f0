"""LERC2 decoder tests (raster/lerc.py) — reference autotest parity.

Checksums come from the reference's own tests:
  * gcore/tiff_read.py test_tiff_read_lerc — byte_lerc.tif cs 4672
  * gdrivers/lerc.py — standalone Lerc2 blobs embedded at /vsisubfile
    offsets inside the gtiff fixtures: int8 4776, (u)int16 4672,
    (u)int32 4672, float32/float64-with-mask band 2755 (invalid = NaN,
    the MRF-LERC NDV rule) or 4591 (invalid = 0), mask 4420
  * gcore/data/gtiff/ rgbsmall_LERC*.tif — bit-exact to rgbsmall.tif
    across strip/tile x pixel/planar x plain/DEFLATE; ZSTD-wrapped
    variants correctly refuse (no zstd library here)."""

from __future__ import annotations

import glob

import numpy as np
import pytest

from gdal_spark.functions.checksum import checksum_image
from gdal_spark.functions.tiff import tiff_decode
from gdal_spark.raster.lerc import lerc2_decode, lerc_strip_decode

GCORE = "/root/reference/autotest/gcore/data/"
GTIFF = GCORE + "gtiff/"


def _dec_tif(path):
    a = tiff_decode(open(path, "rb").read())
    return a[0] if isinstance(a, tuple) else a


def test_byte_lerc_tif_checksum():
    arr = _dec_tif(GCORE + "byte_lerc.tif")
    assert checksum_image(arr)[0] == 4672
    assert np.array_equal(
        np.squeeze(arr), np.squeeze(_dec_tif(GCORE + "byte.tif"))
    )


@pytest.mark.parametrize(
    "name,off,ln,want_cs,want_dt",
    [
        ("lerc_int8.tif", 504, 237, 4776, np.int8),
        ("lerc_uint16.tif", 504, 465, 4672, np.uint16),
        ("lerc_int16.tif", 504, 465, 4672, np.int16),
        ("lerc_uint32.tif", 504, 469, 4672, np.uint32),
        ("lerc_int32.tif", 504, 469, 4672, np.int32),
    ],
)
def test_standalone_blob_datatypes(name, off, ln, want_cs, want_dt):
    blob = open(GTIFF + name, "rb").read()[off : off + ln]
    arr, mask, info = lerc2_decode(blob)
    assert arr.dtype == want_dt
    assert arr.shape == (20, 20)
    assert mask.all()
    assert checksum_image(arr)[0] == want_cs


@pytest.mark.parametrize(
    "name,off,ln,dt",
    [
        ("lerc_float32_with_mask.tif", 304, 1741, np.float32),
        ("lerc_float64_with_mask.tif", 304, 3349, np.float64),
    ],
)
def test_standalone_blob_float_with_mask(name, off, ln, dt):
    blob = open(GTIFF + name, "rb").read()[off : off + ln]
    arr, mask, info = lerc2_decode(blob)
    assert arr.dtype == dt and arr.shape == (24, 22)
    assert not mask.all()
    # mask band checksum (gdrivers/lerc.py: 4420)
    assert checksum_image((mask * 255).astype(np.uint8))[0] == 4420
    # invalid-as-zero (Lerc2::Decode memset) -> the as_mask variant 4591
    assert checksum_image(arr.astype(np.float64))[0] == 4591
    # invalid-as-NaN (MRF-LERC NDV rule) -> the plain-open variant 2755
    a = arr.astype(np.float64).copy()
    a[~mask] = np.nan
    assert checksum_image(a)[0] == 2755


def test_tiff_variants_bit_exact():
    ref_byte = np.squeeze(_dec_tif(GCORE + "byte.tif"))
    ref_rgb = np.squeeze(_dec_tif(GCORE + "rgbsmall.tif"))
    n = 0
    for p in sorted(glob.glob(GTIFF + "*LERC*.tif")):
        arr = np.squeeze(_dec_tif(p))
        want = ref_byte if "byte" in p else ref_rgb
        assert np.array_equal(arr, want), p
        n += 1
    assert n == 18  # plain/DEFLATE/ZSTD x strips/tiles x pixel/planar


def test_zstd_wrapped_decodes():
    """r4 late addition: LERC_ZSTD strips decode through the engine's
    own RFC 8878 zstd decoder (functions/zstd.py) — bit-exact."""
    arr = np.squeeze(_dec_tif(GTIFF + "byte_LERC_ZSTD.tif"))
    assert np.array_equal(arr, np.squeeze(_dec_tif(GCORE + "byte.tif")))


def test_corrupt_blob_rejected():
    blob = bytearray(open(GCORE + "byte_lerc.tif", "rb").read()[378:749])
    blob[100] ^= 0xFF
    with pytest.raises(ValueError):
        lerc2_decode(bytes(blob))  # Fletcher32 mismatch
    with pytest.raises(ValueError):
        lerc2_decode(b"NotLerc" + bytes(64))


def test_strip_decode_zlib_wrapper():
    import zlib

    raw = open(GCORE + "byte_lerc.tif", "rb").read()[378:749]
    arr1, _, _ = lerc_strip_decode(raw)
    arr2, _, _ = lerc_strip_decode(zlib.compress(raw))
    assert np.array_equal(arr1, arr2)


def test_lerc_version2_blob():
    """gdrivers/lerc.py test_lerc_byte_v2: data/mrf/lerc/byte.lrc is a
    VERSION 2 Lerc2 blob (pre-v3 MSB-first bit layout, no checksum):
    512x512 byte, cs 4819."""
    blob = open(
        "/root/reference/autotest/gdrivers/data/mrf/lerc/byte.lrc", "rb"
    ).read()
    arr, mask, info = lerc2_decode(blob)
    assert info["version"] == 2
    assert arr.shape == (512, 512) and mask.all()
    assert checksum_image(arr)[0] == 4819


def test_lerc_v1_cntzimage():
    """gdrivers/lerc.py test_lerc_float32_with_mask_v1: the LERC v1
    (CntZImage) fixture is 512x512 float32 with a partial mask; with
    the NDV-NaN rule the band checksum is 26813 and the mask spans
    0..255."""
    from gdal_spark.raster.lerc import lerc1_decode

    blob = open(
        "/root/reference/autotest/gdrivers/data/mrf/lerc_v1/byte.lrc", "rb"
    ).read()
    arr, mask, info = lerc1_decode(blob)
    assert arr.dtype == np.float32 and arr.shape == (512, 512)
    assert not mask.all() and mask.any()
    a = arr.astype(np.float64).copy()
    a[~mask] = np.nan
    assert checksum_image(a)[0] == 26813
