"""External-codec delegation tests — functions/extcodecs.py.

The reference's frmts/heif and frmts/avif link the system libheif /
libavif; the engine binds the same libraries with ctypes.  Tests are
skip-guarded on library presence (this sandbox has both); the
committed fixtures also pin decoded aggregates so a silently broken
binding cannot pass."""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.functions import codecs as C
from gdal_spark.functions import extcodecs as X
from gdal_spark.functions.heif_fixtures import AVIF_FIXTURE, HEIC_FIXTURE
from gdal_spark.functions.webp_fixtures import fixture_gradient

needs_heif = pytest.mark.skipif(not X.heif_available(),
                                reason="libheif not present")
needs_avif = pytest.mark.skipif(not X.avif_available(),
                                reason="libavif not present")


def _psnr(a, b) -> float:
    mse = ((a.astype(float) - b.astype(float)) ** 2).mean()
    return float(10 * np.log10(255 * 255 / mse)) if mse else 99.0


@needs_heif
def test_heic_fixture_decodes():
    rgb = X.heif_decode(HEIC_FIXTURE)
    assert rgb.shape == (16, 16, 3)
    assert _psnr(rgb, fixture_gradient()) >= 30.0
    assert C.classify_image(HEIC_FIXTURE, "heif") == "ok"


@needs_avif
def test_avif_fixture_decodes():
    rgb = X.avif_decode(AVIF_FIXTURE)
    assert rgb.shape == (16, 16, 3)
    assert _psnr(rgb, fixture_gradient()) >= 30.0
    assert C.classify_image(AVIF_FIXTURE, "avif") == "ok"


@needs_heif
def test_heif_roundtrip_various_sizes():
    rng = np.random.default_rng(3)
    for shape in [(16, 16), (33, 47), (64, 64)]:
        img = rng.integers(0, 256, shape + (3,), dtype=np.uint8)
        # HEVC default quality on noise is rough; use a gradient too
        yy, xx = np.mgrid[: shape[0], : shape[1]]
        smooth = np.stack([(yy * 5) % 256, (xx * 3) % 256,
                           (yy + xx) % 256], -1).astype(np.uint8)
        for src in (smooth,):
            out = X.heif_decode(X.heif_encode(src))
            assert out.shape == src.shape
            assert _psnr(out, src) >= 25.0
        # noise just needs shape integrity
        out = X.heif_decode(X.heif_encode(img))
        assert out.shape == img.shape


@needs_avif
def test_avif_roundtrip():
    yy, xx = np.mgrid[:40, :56]
    src = np.stack([(yy * 4) % 256, (xx * 4) % 256,
                    255 - (yy + xx) % 256], -1).astype(np.uint8)
    out = X.avif_decode(X.avif_encode(src))
    assert out.shape == src.shape
    assert _psnr(out, src) >= 30.0


@needs_heif
def test_registry_and_junk_classification():
    arr = fixture_gradient()
    buf = C.encode_image(arr, "heif")
    assert C.decode_image(buf, "heif").shape == arr.shape
    junk = (32).to_bytes(4, "big") + b"ftypheic" + bytes(24)
    assert C.classify_image(junk, "heif") == "corrupt"
    assert C.classify_image(junk, "avif") == "corrupt"


def test_unavailable_maps_to_quarantine(monkeypatch):
    """When the library is missing, classification must degrade to
    unsupported_codec — simulated by forcing the loader to fail."""
    monkeypatch.setattr(X, "_heif_lib", False)
    try:
        with pytest.raises(X.ExternalCodecUnavailable):
            X.heif_decode(HEIC_FIXTURE)
        assert C.classify_image(HEIC_FIXTURE, "heif") == "unsupported_codec"
    finally:
        monkeypatch.setattr(X, "_heif_lib", None)


@needs_heif
@needs_avif
def test_hostile_bytes_raise_not_crash():
    """The quarantine classifier feeds arbitrary corpus bytes to the
    native libs; parse failures must surface as ValueError (libheif /
    libavif return error codes for malformed containers)."""
    import random

    rng = random.Random(77)
    base_h = bytearray(HEIC_FIXTURE)
    base_a = bytearray(AVIF_FIXTURE)
    for _ in range(40):
        bh = bytearray(base_h)
        ba = bytearray(base_a)
        for _ in range(rng.randrange(1, 8)):
            bh[rng.randrange(16, len(bh))] = rng.randrange(256)
            ba[rng.randrange(16, len(ba))] = rng.randrange(256)
        for fn, blob in ((X.heif_decode, bh), (X.avif_decode, ba)):
            try:
                fn(bytes(blob))
            except ValueError:
                pass
    for fn in (X.heif_decode, X.avif_decode):
        for blob in (b"", bytes(8), (32).to_bytes(4, "big") + b"ftypheic"):
            with pytest.raises(ValueError):
                fn(blob)
