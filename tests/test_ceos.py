"""CEOS + SAR_CEOS drivers vs the reference autotests
(autotest/gdrivers/ceos.py test_ceos_1, autotest/gdrivers/sar_ceos.py
test_sar_ceos_app_1 / test_sar_ceos_asf_2)."""

import os
import struct

import numpy as np
import pytest

from gdal_spark.functions.checksum import checksum
from gdal_spark.raster.ceos import (
    IMAGRY_OPT_FILE,
    SARCEOSVolume,
    TYP_CCP_COMPLEX_FLOAT,
    TYP_PALSAR_COMPLEX_SHORT,
    ceos_available_lines,
    ceos_read_window,
    detect_ceos,
    detect_sar_ceos,
    read_ceos_fdr,
    sar_ceos_open,
)

D = "/root/reference/autotest/gdrivers/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(D, "ceos")),
    reason="reference autotest data missing",
)


def test_ceos_irs_lgsowg():
    """autotest/gdrivers/ceos.py test_ceos_1: little-endian IRS LGSOWG
    scene (#1862), band 4 over the 3 surviving scanlines, checksum 9956."""
    data = open(os.path.join(D, "ceos", "IMAGERY-75K.L-3"), "rb").read()
    assert detect_ceos(data)
    info = read_ceos_fdr(data)
    assert info["little_endian"]
    assert (info["width"], info["height"], info["nbands"]) == (5932, 5936, 4)
    assert ceos_available_lines(data, info, 4) == 3
    win = ceos_read_window(data, info, 4, 0, 3)
    assert checksum(win) == 9956  # reference: 9956
    with pytest.raises(IOError):
        ceos_read_window(data, info, 4, 0, 4)


def test_sar_ceos_ottawa():
    """test_sar_ceos_app_1: RADARSAT CDPF patch, imagery file only.
    Reference expects open to succeed and Checksum() to error (-1)."""
    v = sar_ceos_open(os.path.join(D, "sar_ceos", "ottawa_patch.img"))
    assert (v.width, v.height, v.nbands) == (1790, 1827, 1)
    assert v.dtype_name == "UInt16"
    # only 4 full data records survive in the 32 KB patch
    assert v.available_lines() == 4
    with pytest.raises(IOError):
        v.read_band(1)
    # partial window decodes as big-endian uint16
    win = v.read_band(1, 0, 4)
    assert win.shape == (4, 1790) and win.dtype.itemsize == 2
    raw = open(os.path.join(D, "sar_ceos", "ottawa_patch.img"), "rb").read()
    # line 3 starts at fdl + 2*bpr + ids = 16252 + 2*3772 + 192
    want = np.frombuffer(raw, ">u2", 1790, 16252 + 2 * 3772 + 192)
    assert np.array_equal(win[2], want)


def test_sar_ceos_asf_r1():
    """test_sar_ceos_asf_2: RADARSAT-1 ASF product, leader found via the
    {'', 'L', 'D', ...} extension row."""
    v = sar_ceos_open(os.path.join(D, "sar_ceos", "R1_26161_FN1_F164.D"))
    assert (v.width, v.height, v.nbands) == (8192, 8192, 1)
    assert v.dtype_name == "Byte"
    md = v.metadata()
    assert md["CEOS_MISSION_ID"] == "RSAT-1"
    assert md["CEOS_ORBIT_NUMBER"] == "26161"
    assert md["CEOS_FACILITY"] == "ASF-PGS"
    assert md["CEOS_ACQUISITION_TIME"] == "20001108013126089"
    # ASF facility-data record corner GCPs in UL,LL,UR,LR order
    gcps = v.gcps()
    assert len(gcps) == 4
    assert gcps[0][:2] == (0.5, 0.5)
    assert gcps[1][:2] == (0.5, 8191.5)
    assert abs(gcps[0][3] - 65.6810532) < 1e-6
    assert abs(gcps[0][2] - -120.4172058) < 1e-6


def _synth_volume(data_type, bpp, nchans, width=6, lines=3, payload=None):
    """Build a one-record-per-line BSQ imagery file around a payload."""
    ids = 192
    bpr = ids + width * bpp
    fdl = 448
    hdr = bytearray(fdl)
    struct.pack_into(">i", hdr, 0, 1)
    hdr[4:8] = bytes((63, 192, 18, 18))
    struct.pack_into(">i", hdr, 8, fdl)

    def put(off, n, s):
        hdr[off - 1 : off - 1 + n] = s.ljust(n).encode()[:n]

    put(225, 4, str(bpp))
    put(233, 4, str(nchans))
    put(237, 8, str(lines))
    put(249, 8, str(width))
    put(269, 4, "BSQ")
    put(273, 2, "1")
    put(277, 4, "180")
    put(281, 8, str(width * bpp))
    put(289, 4, "0")
    if data_type == TYP_CCP_COMPLEX_FLOAT:
        put(401, 28, "COMPRESSED CROSS-PRODUCTS")
        put(429, 4, "")
    elif data_type == TYP_PALSAR_COMPLEX_SHORT:
        put(401, 28, "INTEGER*18")
        put(49, 16, "ALOS-PSR")
        put(429, 4, "")
    else:
        put(429, 4, "IU1")
    body = bytearray()
    rng = np.random.default_rng(7)
    for i in range(lines):
        rec = bytearray(bpr)
        struct.pack_into(">i", rec, 0, 2 + i)
        rec[4:8] = bytes((50, 11, 18, 20))
        struct.pack_into(">i", rec, 8, bpr)
        if payload is not None:
            rec[ids:] = payload[i]
        else:
            rec[ids:] = rng.integers(0, 255, width * bpp, np.uint8).tobytes()
        body += rec
    return bytes(hdr) + bytes(body)


def test_sar_ceos_ccp_decode():
    """CCPRasterBand math: scale = sqrt((b2/254+1.5) * 2^b1)."""
    width, lines = 4, 2
    rng = np.random.default_rng(3)
    groups = rng.integers(-120, 120, (lines, width, 10)).astype(np.int8)
    payload = [groups[i].tobytes() for i in range(lines)]
    data = _synth_volume(TYP_CCP_COMPLEX_FLOAT, 10, 4, width, lines, payload)
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".img", delete=False) as f:
        f.write(data)
        path = f.name
    try:
        v = sar_ceos_open(path)
        assert v.desc["data_type"] == TYP_CCP_COMPLEX_FLOAT
        assert v.nbands == 4 and v.dtype_name == "CFloat32"
        line = v.read_line(2, 1)  # HV
        g = groups[0].astype(np.float64)
        scale = np.sqrt((g[:, 1] / 254.0 + 1.5) * np.exp2(g[:, 0]))
        want = (g[:, 4] * scale / 127.0) + 1j * (g[:, 5] * scale / 127.0)
        assert np.allclose(line, want.astype(np.complex64), rtol=1e-6)
    finally:
        os.unlink(path)


def test_sar_ceos_palsar_covariance():
    """PALSARRasterBand: covariance scaling (×2 on C22, ×sqrt2 on C12,
    conj×sqrt2 on C23)."""
    width, lines = 3, 1
    vals = (np.arange(width * 9).reshape(width, 9) * 100 - 800).astype(">i2")
    payload = [vals.tobytes()]
    data = _synth_volume(TYP_PALSAR_COMPLEX_SHORT, 18, 1, width, lines, payload)
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".img", delete=False) as f:
        f.write(data)
        path = f.name
    try:
        v = sar_ceos_open(path)
        assert v.desc["data_type"] == TYP_PALSAR_COMPLEX_SHORT
        assert v.nbands == 6 and v.dtype_name == "CInt16"
        c11 = v.read_line(1, 1)
        assert np.array_equal(c11[:, 0], vals[:, 0].astype(np.int16))
        assert np.all(c11[:, 1] == 0)
        c22 = v.read_line(2, 1)
        assert np.array_equal(c22[:, 0], (vals[:, 2] * 2).astype(np.int16))
        c12 = v.read_line(4, 1)
        want_re = np.floor(vals[:, 3].astype(float) * np.sqrt(2) + 0.5)
        want_im = np.floor(vals[:, 4].astype(float) * np.sqrt(2) + 0.5)
        assert np.array_equal(c12[:, 0], want_re.astype(np.int16))
        assert np.array_equal(c12[:, 1], want_im.astype(np.int16))
        c23 = v.read_line(6, 1)
        want_im6 = np.floor(-vals[:, 8].astype(float) * np.sqrt(2) + 0.5)
        assert np.array_equal(c23[:, 1], want_im6.astype(np.int16))
    finally:
        os.unlink(path)


def test_identify_ceos():
    from gdal_spark.sources.identify import identify_driver

    irs = open(os.path.join(D, "ceos", "IMAGERY-75K.L-3"), "rb").read(1024)
    assert identify_driver(irs, "IMAGERY-75K.L-3") == "CEOS"
    ott = open(os.path.join(D, "sar_ceos", "ottawa_patch.img"), "rb").read(1024)
    assert detect_sar_ceos(ott)
    assert identify_driver(ott, "ottawa_patch.img") == "SAR_CEOS"
    r1 = open(os.path.join(D, "sar_ceos", "R1_26161_FN1_F164.D"), "rb").read(1024)
    assert identify_driver(r1, "R1_26161_FN1_F164.D") == "SAR_CEOS"
