"""Progressive JPEG (SOF2) decode validation.

Strategy: the baseline (SOF0) decode path is already bit-exact against
the reference's vendored libjpeg (test_jpeg.py albania goldens), so a
baseline stream and a progressive stream built from the SAME quantized
coefficients must decode to bit-identical pixels — any defect in the
progressive scan assembly (DC first/refine, AC first EOB runs, AC
refinement correction bits, restart handling, non-interleaved dims)
breaks the equality.  Real-world SOF2 fixtures from the reference
autotest (gdrivers/data/jpeg/arcgis_*.jpg) pin decode stability.

Reference semantics: T.81 G.2 via libjpeg jdhuff.c
decode_mcu_{DC,AC}_{first,refine} (consumed by frmts/jpeg/
jpgdataset.cpp through jpeg_read_scanlines).
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pytest

from gdal_spark.functions import jpeg as J
from gdal_spark.functions.jpeg import (
    jpeg_decode,
    jpeg_encode,
    jpeg_encode_progressive,
)


def _textured(shape, seed=42):
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
    y, x = np.mgrid[0:shape[0], 0:shape[1]]
    return ((arr.astype(np.int64) // 3
             + (np.sin(x / 5) * 80 + np.cos(y / 7) * 80)[..., None]
             + 90).clip(0, 255)).astype(np.uint8)


@pytest.mark.parametrize("shape,gray", [
    ((16, 16, 3), False),
    ((64, 48, 3), False),
    ((33, 57, 3), False),   # partial edge blocks
    ((40, 40, 3), True),
    ((8, 8, 3), False),     # single block
    ((30, 30, 3), True),
])
@pytest.mark.parametrize("quality", [50, 85, 95])
def test_progressive_equals_baseline(shape, gray, quality):
    arr = _textured(shape)
    db = jpeg_decode(jpeg_encode(arr, quality, gray=gray))
    dp = jpeg_decode(jpeg_encode_progressive(arr, quality, gray=gray))
    np.testing.assert_array_equal(db, dp)


@pytest.mark.parametrize("restart", [1, 2, 3, 7, 16])
def test_progressive_restart_markers(restart):
    arr = _textured((48, 64, 3))
    db = jpeg_decode(jpeg_encode(arr, 85))
    dp = jpeg_decode(jpeg_encode_progressive(arr, 85, restart=restart))
    np.testing.assert_array_equal(db, dp)


def test_progressive_flat_image_long_eob_runs():
    """A flat image at low quality maximizes EOB-run coding (every AC
    block empty -> one long EOBn per scan)."""
    arr = np.full((80, 80, 3), 130, np.uint8)
    db = jpeg_decode(jpeg_encode(arr, 30))
    dp = jpeg_decode(jpeg_encode_progressive(arr, 30))
    np.testing.assert_array_equal(db, dp)


# -- 4:2:0 subsampled progressive ----------------------------------------
# The shipped encoders are 4:4:4; to exercise the decoder's subsampled
# progressive path (interleaved DC MCUs with 2x2 luma blocks,
# non-interleaved AC scans over ceil-dims smaller than the MCU-padded
# grid) we build baseline and progressive 4:2:0 streams test-locally
# from shared coefficient grids and require identical decodes.


def _blocks_420(arr, quality):
    """-> (yb (2mcuy,2mcux,64), cbb, crb (mcuy,mcux,64), ql, qc)."""
    h, w, _ = arr.shape
    mcux = (w + 15) // 16
    mcuy = (h + 15) // 16
    ql, qc = J._quality_tables(quality)
    ycc = J._rgb_to_ycbcr(arr)
    ypad = np.pad(ycc[..., 0], ((0, 16 * mcuy - h), (0, 16 * mcux - w)),
                  mode="edge")
    yb = J._component_blocks(ypad, ql)
    # chroma: 2x2 mean then pad to the MCU grid
    hp = np.pad(ycc, ((0, h % 2), (0, w % 2), (0, 0)), mode="edge")
    sub = hp.reshape(hp.shape[0] // 2, 2, hp.shape[1] // 2, 2, 3)
    sub = sub.mean(axis=(1, 3))
    cpad = [np.pad(sub[..., i], ((0, 8 * mcuy - sub.shape[0]),
                                 (0, 8 * mcux - sub.shape[1])),
                   mode="edge") for i in (1, 2)]
    cbb = J._component_blocks(cpad[0], qc)
    crb = J._component_blocks(cpad[1], qc)
    return yb, cbb, crb, ql, qc


def _headers_420(h, w, ql, qc, sof_marker):
    out = bytearray(b"\xff\xd8")
    out += J._seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += J._seg(0xDB, b"\x00" + bytes(ql[J._ZZ].astype(np.uint8)))
    out += J._seg(0xDB, b"\x01" + bytes(qc[J._ZZ].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    sof += bytes([1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1])
    out += J._seg(sof_marker, sof)
    return out


def _encode_baseline_420(arr, quality):
    h, w, _ = arr.shape
    yb, cbb, crb, ql, qc = _blocks_420(arr, quality)
    mcuy, mcux = cbb.shape[:2]
    dc_codes = J._canonical_codes(J._DC_BITS, J._DC_VALS)
    ac_codes = J._canonical_codes(J._AC_BITS, J._AC_VALS)
    bw = J._BitWriter()
    pred = [0, 0, 0]

    def put_block(zz, ci):
        dc = int(zz[0])
        diff = dc - pred[ci]
        pred[ci] = dc
        size = abs(diff).bit_length()
        code, ln = dc_codes[size]
        bw.put(code, ln)
        if size:
            bw.put(diff if diff >= 0 else diff + (1 << size) - 1, size)
        nz = np.nonzero(zz[1:])[0]
        prev = 0
        for k in nz.tolist():
            run = k - prev
            prev = k + 1
            while run > 15:
                z = ac_codes[0xF0]
                bw.put(z[0], z[1])
                run -= 16
            v = int(zz[k + 1])
            size = abs(v).bit_length()
            code, ln = ac_codes[(run << 4) | size]
            bw.put(code, ln)
            bw.put(v if v >= 0 else v + (1 << size) - 1, size)
        if prev < 63:
            e = ac_codes[0x00]
            bw.put(e[0], e[1])

    for my in range(mcuy):
        for mx in range(mcux):
            for by in range(2):
                for bx in range(2):
                    put_block(yb[2 * my + by, 2 * mx + bx], 0)
            put_block(cbb[my, mx], 1)
            put_block(crb[my, mx], 2)
    bw.flush()

    out = _headers_420(h, w, ql, qc, 0xC0)
    out += J._seg(0xC4, b"\x00" + bytes(J._DC_BITS) + bytes(J._DC_VALS))
    out += J._seg(0xC4, b"\x10" + bytes(J._AC_BITS) + bytes(J._AC_VALS))
    out += J._seg(0xC4, b"\x01" + bytes(J._DC_BITS) + bytes(J._DC_VALS))
    out += J._seg(0xC4, b"\x11" + bytes(J._AC_BITS) + bytes(J._AC_VALS))
    out += J._seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def _encode_progressive_420(arr, quality):
    h, w, _ = arr.shape
    yb, cbb, crb, ql, qc = _blocks_420(arr, quality)
    comps = [yb, cbb, crb]
    samp = [(2, 2), (1, 1), (1, 1)]
    mcuy, mcux = cbb.shape[:2]
    dc_codes = J._canonical_codes(J._PDC_BITS, J._PDC_VALS)
    ac_codes = J._canonical_codes(J._PAC_BITS, J._PAC_VALS)

    def ceil_dims(ci):
        cw = (w * samp[ci][0] + 1) // 2
        ch = (h * samp[ci][1] + 1) // 2
        return (ch + 7) // 8, (cw + 7) // 8

    def dc_scan(bw, ah, al):
        pred = [0, 0, 0]
        for my in range(mcuy):
            for mx in range(mcux):
                blocks = ([(0, 2 * my + by, 2 * mx + bx)
                           for by in range(2) for bx in range(2)]
                          + [(1, my, mx), (2, my, mx)])
                for ci, by, bx in blocks:
                    dc = int(comps[ci][by, bx, 0]) >> al
                    if ah == 0:
                        diff = dc - pred[ci]
                        pred[ci] = dc
                        size = abs(diff).bit_length()
                        code, ln = dc_codes[size]
                        bw.put(code, ln)
                        if size:
                            bw.put(diff if diff >= 0
                                   else diff + (1 << size) - 1, size)
                    else:
                        bw.put(dc & 1, 1)

    out = _headers_420(h, w, ql, qc, 0xC2)
    out += J._seg(0xC4, b"\x00" + bytes(J._PDC_BITS) + bytes(J._PDC_VALS))
    out += J._seg(0xC4, b"\x10" + bytes(J._PAC_BITS) + bytes(J._PAC_VALS))
    for comp_ids, ss, se, ah, al in J._default_scan_script(3):
        sos = bytes([len(comp_ids)])
        for ci in comp_ids:
            sos += bytes([ci + 1, 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        out += J._seg(0xDA, sos)
        bw = J._BitWriter()
        if ss == 0:
            dc_scan(bw, ah, al)
        else:
            ci = comp_ids[0]
            bh_, bw_ = ceil_dims(ci)
            blocks = comps[ci][:bh_, :bw_].reshape(bh_ * bw_, 64)
            if ah == 0:
                J._emit_ac_first(bw, blocks, ss, se, al, ac_codes)
            else:
                J._emit_ac_refine(bw, blocks, ss, se, al, ac_codes)
        bw.flush()
        out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


@pytest.mark.parametrize("shape", [(32, 32, 3), (50, 50, 3), (17, 41, 3)])
def test_progressive_420_equals_baseline_420(shape):
    """Subsampled progressive: interleaved DC over 2x2-luma MCUs +
    non-interleaved AC over ceil dims (< the MCU-padded grid when
    w or h isn't a multiple of 16)."""
    arr = _textured(shape, seed=3)
    db = jpeg_decode(_encode_baseline_420(arr, 85))
    dp = jpeg_decode(_encode_progressive_420(arr, 85))
    np.testing.assert_array_equal(db, dp)


# -- real-world SOF2 fixtures from the reference autotest ----------------

_FIX = "/root/reference/autotest/gdrivers/data/jpeg"


@pytest.mark.skipif(not os.path.isdir(_FIX), reason="autotest data missing")
def test_arcgis_progressive_fixtures():
    """The only SOF2 files in the reference autotest corpus (used
    upstream for GCP metadata; decoded here for pixels).  Goldens are
    pinned from this implementation: both images are uniform fills,
    which the entropy-data sizes corroborate."""
    d = open(f"{_FIX}/arcgis_geodataxform_gcp.jpg", "rb").read()
    a = jpeg_decode(d)
    assert a.shape == (30, 30, 3)
    assert int(a.min()) == int(a.max()) == 1

    d2 = open(f"{_FIX}/arcgis_metadata_geodataxform_gcp.jpg", "rb").read()
    b = jpeg_decode(d2)
    assert b.shape == (62, 58, 3)
    assert int(b.min()) == int(b.max()) == 0


def test_truncated_progressive_no_crash():
    """A progressive stream cut off mid-entropy must fail softly
    (ValueError or a decoded array from 1-bit fill), never IndexError."""
    arr = _textured((32, 32, 3))
    full = jpeg_encode_progressive(arr, 85)
    for cut in (len(full) // 3, len(full) // 2, len(full) - 20):
        data = full[:cut] + b"\xff\xd9"
        try:
            out = jpeg_decode(data)
            assert out.shape == (32, 32, 3)
        except ValueError:
            pass


# -- lossless (SOF3) ------------------------------------------------------

def test_lossless_fixture_bit_exact():
    """byte_lossless.jpg == byte.tif exactly (test_jpeg_read_lossless
    expects checksum 4672); 16-bit lossless rejected like the
    reference (test_jpeg_read_lossless_16bit expects failure)."""
    from gdal_spark.functions.checksum import checksum_image
    from gdal_spark.functions.tiff import tiff_parse

    D = "/root/reference/autotest/gdrivers/data/jpeg/"
    if not os.path.isdir(D):
        pytest.skip("autotest data missing")
    a = jpeg_decode(open(D + "byte_lossless.jpg", "rb").read())
    assert checksum_image(a)[0] == 4672
    byte, _ = tiff_parse(
        open("/root/reference/autotest/gcore/data/byte.tif", "rb").read())
    np.testing.assert_array_equal(a[:, :, 0], np.squeeze(byte))
    with pytest.raises(ValueError, match="lossless JPEG precision"):
        jpeg_decode(open(D + "uint16_lossless.jpg", "rb").read())


@pytest.mark.parametrize("predictor", [1, 2, 3, 4, 5, 6, 7])
def test_lossless_roundtrip_all_predictors(predictor):
    from gdal_spark.functions.jpeg import jpeg_encode_lossless

    arr = _textured((23, 37, 3))[:, :, 0]
    buf = jpeg_encode_lossless(arr, predictor)
    out = jpeg_decode(buf)
    np.testing.assert_array_equal(out[:, :, 0], arr)


def test_lossless_point_transform():
    from gdal_spark.functions.jpeg import jpeg_encode_lossless

    arr = _textured((16, 16, 3))[:, :, 0]
    buf = jpeg_encode_lossless(arr, 4, pt=2)
    out = jpeg_decode(buf)
    np.testing.assert_array_equal(out[:, :, 0], (arr >> 2) << 2)
