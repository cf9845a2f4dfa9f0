"""GFF / COASP / AirSAR / JAXA PALSAR decoders (raster/sar_small.py)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from gdal_spark.raster.sar_small import (
    airsar_read,
    coasp_read,
    gff_decode,
    palsar_identify,
    palsar_read,
)


# ---------------------------------------------------------------- GFF

def _gff_bytes(arr: np.ndarray, image_type: int, row_major: int = 1,
               bpp: int | None = None, hdr_len: int = 128) -> bytes:
    h, w = arr.shape
    hdr = bytearray(hdr_len)
    hdr[0:7] = b"GSATIMG"
    struct.pack_into("<HH", hdr, 8, 7, 1)        # minor=7, major=1
    struct.pack_into("<I", hdr, 12, hdr_len)
    struct.pack_into("<H", hdr, 54, 0)           # endianness
    if bpp is None:
        bpp = {0: 1, 2: 8}.get(image_type, 8)
    mult = 1 if image_type == 0 else 2
    if row_major:
        rg, az = w * mult, h
    else:
        rg, az = h, w * mult
    struct.pack_into("<6I", hdr, 56, bpp, 1, image_type, row_major, rg, az)
    if image_type == 0:
        payload = arr.astype("u1").tobytes()
    elif image_type == 1 and bpp == 4:
        iq = np.empty((h, w, 2), "<i2")
        iq[..., 0], iq[..., 1] = arr.real, arr.imag
        payload = iq.tobytes()
    elif image_type == 1:
        iq = np.empty((h, w, 2), "<i4")
        iq[..., 0], iq[..., 1] = arr.real, arr.imag
        payload = iq.tobytes()
    else:
        iq = np.empty((h, w, 2), "<f4")
        iq[..., 0], iq[..., 1] = arr.real, arr.imag
        payload = iq.tobytes()
    return bytes(hdr) + payload


def test_gff_cfloat32():
    rng = np.random.default_rng(7)
    want = (rng.normal(size=(5, 4)) + 1j * rng.normal(size=(5, 4))).astype(
        np.complex64
    )
    got, meta = gff_decode(_gff_bytes(want, image_type=2))
    assert got.dtype == np.complex64
    np.testing.assert_array_equal(got, want)
    assert meta["VERSION"] == "1.7"
    assert meta["IMAGE_TYPE"] == 2


def test_gff_cint16_and_byte():
    want = (np.arange(12).reshape(3, 4) + 1j * np.arange(12).reshape(3, 4))
    got, _ = gff_decode(_gff_bytes(want, image_type=1, bpp=4))
    np.testing.assert_array_equal(got, want.astype(np.complex64))
    got32, _ = gff_decode(_gff_bytes(want, image_type=1, bpp=8))
    np.testing.assert_array_equal(got32, want.astype(np.complex64))

    by = np.arange(20, dtype=np.uint8).reshape(4, 5)
    gotb, meta = gff_decode(_gff_bytes(by, image_type=0))
    np.testing.assert_array_equal(gotb, by)


def test_gff_column_major_dims():
    # row_major=0: X comes from the azimuth count, Y from range
    want = (np.ones((3, 4)) + 2j * np.ones((3, 4))).astype(np.complex64)
    got, _ = gff_decode(_gff_bytes(want, image_type=2, row_major=0))
    assert got.shape == (3, 4)


def test_gff_rejects_non_gff():
    with pytest.raises(ValueError):
        gff_decode(b"NOTGFF" + b"\x00" * 100)


# -------------------------------------------------------------- COASP

def _coasp_rc(arr: np.ndarray) -> bytes:
    iq = np.empty((*arr.shape, 2), ">f4")
    iq[..., 0], iq[..., 1] = arr.real, arr.imag
    return iq.tobytes()


def test_coasp_all_pols():
    rng = np.random.default_rng(3)
    mk = lambda: (rng.normal(size=(4, 5)) + 1j * rng.normal(size=(4, 5))).astype(
        np.complex64
    )
    hh, hv, vh, vv = mk(), mk(), mk(), mk()
    hdr = (
        "time_first_datarec 12:00:00.123\n"
        "number_lines 4\n"
        "number_samples 5\n"
        "angle_antenna 35.2 deg\n"
    )
    files = {
        "scene_hh.rc": _coasp_rc(hh),
        "scene_hv.rc": _coasp_rc(hv),
        "scene_vh.rc": _coasp_rc(vh),
        "scene_vv.rc": _coasp_rc(vv),
    }
    # basename truncation drops the trailing "01"
    bands, meta = coasp_read("scene_hh01.hdr", hdr, files)
    assert [p for p, _ in bands] == ["hh", "hv", "vh", "vv"]
    np.testing.assert_array_equal(bands[0][1], hh)
    np.testing.assert_array_equal(bands[3][1], vv)
    assert meta["MATRIX_REPRESENTATION"] == "SCATTERING"
    # multi-token value join
    assert meta["angle_antenna"] == "35.2 deg"


def test_coasp_single_pol():
    arr = (np.zeros((2, 3)) + 1j).astype(np.complex64)
    bands, meta = coasp_read(
        "s_vv99.hdr",
        "time_first_datarec x\nnumber_lines 2\nnumber_samples 3\n",
        {"s_vv.rc": _coasp_rc(arr)},
    )
    assert [p for p, _ in bands] == ["vv"]
    assert "MATRIX_REPRESENTATION" not in meta


# ------------------------------------------------------------- AirSAR

def _airsar_bytes(b: np.ndarray, rec_len: int = 100) -> bytes:
    """b: (h, w, 10) int8 compressed Stokes bytes."""
    h, w, _ = b.shape
    assert w * 10 <= rec_len
    recs = [
        f"RECORD LENGTH IN BYTES =  {rec_len}",
        "NUMBER OF HEADER RECORDS =  2",
        f"NUMBER OF SAMPLES PER RECORD =  {w}",
        f"NUMBER OF LINES IN IMAGE =  {h}",
        "JPL AIRCRAFT SAR PROCESSOR VERSION   3.56",
        "DATA TYPE =  COMPRESSED STOKES MATRIX",
        "BYTE OFFSET OF FIRST DATA RECORD =  1000",
        "BYTE OFFSET OF PARAMETER HEADER =  700",
    ]
    hdr = bytearray()
    for r in recs:
        hdr += r.ljust(50).encode()
    hdr += b" " * 50  # all-spaces terminator
    out = bytearray(1000 + h * rec_len)
    out[: len(hdr)] = hdr
    ph = ("SITE NAME".ljust(42) + "TESTSITE").encode() + b" " * 50
    out[700:700 + len(ph)] = ph
    for y in range(h):
        row = b[y].tobytes()
        out[1000 + y * rec_len:1000 + y * rec_len + len(row)] = row
    return bytes(out)


def test_airsar_covariance_bands():
    rng = np.random.default_rng(11)
    raw = rng.integers(-100, 100, size=(3, 4, 10)).astype(np.int8)
    raw[..., 0] = rng.integers(-8, 4, size=(3, 4))  # sane exponents
    bands, md = airsar_read(_airsar_bytes(raw))
    assert [n for n, _ in bands] == [
        "Covariance_11", "Covariance_12", "Covariance_13",
        "Covariance_22", "Covariance_23", "Covariance_33",
    ]
    assert md["MH_NUMBER_OF_SAMPLES_PER_RECORD"] == "4"
    assert md["PH_SITE_NAME"] == "TESTSITE"
    assert md["MATRIX_REPRESENTATION"] == "SYMMETRIZED_COVARIANCE"

    # independently recompute one pixel of C11 and C23
    b0 = raw[1, 2].astype(np.float64)
    m11 = (b0[1] / 254.0 + 1.5) * 2.0 ** b0[0]
    m12 = b0[2] * m11 / 127.0
    m33 = b0[7] * m11 / 127.0
    m44 = b0[9] * m11 / 127.0
    m22 = m11 - m33 - m44
    c11 = bands[0][1][1, 2]
    assert c11.imag == 0.0
    np.testing.assert_allclose(c11.real, m11 + m22 + 2 * m12, rtol=1e-6)

    sqrt2 = 1.4142135623730951
    m13 = b0[3] * abs(b0[3]) * m11 / 127.0 ** 2
    m23 = b0[5] * abs(b0[5]) * m11 / 127.0 ** 2
    m14 = b0[4] * abs(b0[4]) * m11 / 127.0 ** 2
    m24 = b0[6] * abs(b0[6]) * m11 / 127.0 ** 2
    c23 = bands[4][1][1, 2]
    np.testing.assert_allclose(c23.real, sqrt2 * (m13 - m23), rtol=1e-6)
    np.testing.assert_allclose(c23.imag, sqrt2 * (m24 - m14), rtol=1e-6)


def test_airsar_rejects_uncompressed():
    with pytest.raises(ValueError):
        airsar_read(b"RECORD LENGTH IN BYTES =  100".ljust(800))


# -------------------------------------------------------- JAXA PALSAR

def _palsar_vol() -> bytes:
    vol = bytearray(360)
    struct.pack_into(">I", vol, 0, 1)
    vol[4], vol[5], vol[6], vol[7] = 192, 192, 18, 18
    struct.pack_into(">I", vol, 8, 360)
    vol[60:62] = b"AL"
    return bytes(vol)


def _palsar_img(arr: np.ndarray, level: str) -> bytes:
    h, w = arr.shape
    if level == "1.1":
        bits, spg, prefix, px = 32, 2, 412, 8
    else:
        bits, spg, prefix, px = 16, 1, 192, 2
    rec = prefix + w * px
    img = bytearray(720 + (h + 1) * rec)
    img[216:220] = f"{bits:4d}".encode()
    img[220:224] = f"{spg:4d}".encode()
    img[236:244] = f"{h:8d}".encode()
    img[186:192] = f"{rec:6d}".encode()
    for y in range(h):
        off = 720 + (y - 1) * rec + prefix  # reference's exact arithmetic
        if level == "1.1":
            iq = np.empty((w, 2), ">f4")
            iq[:, 0], iq[:, 1] = arr[y].real, arr[y].imag
            img[off:off + w * px] = iq.tobytes()
        else:
            img[off:off + w * px] = arr[y].astype(">u2").tobytes()
    return bytes(img)


def test_palsar_identify():
    assert palsar_identify(_palsar_vol(), "VOL-ALPSRP000000000-H1.5_UA")
    assert not palsar_identify(b"\x00" * 360, "VOL-ALPSRP000000000")
    assert not palsar_identify(_palsar_vol(), "VOL-XXXXXX000")


def test_palsar_level15_with_leader():
    rng = np.random.default_rng(5)
    hh = rng.integers(0, 60000, size=(3, 4)).astype(np.uint16)
    hv = rng.integers(0, 60000, size=(3, 4)).astype(np.uint16)
    suffix = "-ALPSRP000000000-H1.5_UA"
    led = bytearray(720 + 4096 + 1300)
    led[720 + 1174:720 + 1174 + 16] = b"             4.0"
    base = 720 + 4096
    led[base + 92:base + 92 + 16] = b"            12.5"
    led[base + 412:base + 444] = b"UTM-PROJECTION".ljust(32)
    coords = [10.0, 100.0, 10.0, 101.0, 9.0, 101.0, 9.0, 100.0]
    for i, v in enumerate(coords):
        led[base + 1072 + 16 * i:base + 1072 + 16 * (i + 1)] = (
            f"{v:16.7f}".encode()
        )
    files = {
        f"VOL{suffix}": _palsar_vol(),
        f"IMG-HH{suffix}": _palsar_img(hh, "1.5"),
        f"IMG-HV{suffix}": _palsar_img(hv, "1.5"),
        f"LED{suffix}": bytes(led),
    }
    bands, meta, gcps = palsar_read(f"VOL{suffix}", files)
    assert [p for p, _ in bands] == ["HH", "HV"]
    np.testing.assert_array_equal(bands[0][1], hh)
    np.testing.assert_array_equal(bands[1][1], hv)
    assert meta["PRODUCT_LEVEL"] == "1.5"
    assert meta["AZIMUTH_LOOKS"] == "4.0"
    assert meta["PIXEL_SPACING"] == "12.5"
    assert meta["PROJECTION_NAME"] == "UTM-PROJECTION"
    assert len(gcps) == 4
    assert gcps[0][3:] == (100.0, 10.0)


def test_palsar_level11_scattering():
    rng = np.random.default_rng(9)
    mk = lambda: (rng.normal(size=(2, 3)) + 1j * rng.normal(size=(2, 3))).astype(
        np.complex64
    )
    pols = {p: mk() for p in ("HH", "HV", "VH", "VV")}
    suffix = "-ALPSRP111111111-P1.1_UA"
    files = {f"VOL{suffix}": _palsar_vol()}
    for p, a in pols.items():
        files[f"IMG-{p}{suffix}"] = _palsar_img(a, "1.1")
    bands, meta, gcps = palsar_read(f"VOL{suffix}", files)
    assert [p for p, _ in bands] == ["HH", "HV", "VH", "VV"]
    for p, a in bands:
        np.testing.assert_array_equal(a, pols[p])
    assert meta["MATRIX_REPRESENTATION"] == "SCATTERING"
    assert meta["PRODUCT_LEVEL"] == "1.1"
    assert gcps == []
