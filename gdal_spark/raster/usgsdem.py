"""USGS DEM driver (read path) — frmts/usgsdem/usgsdemdataset.cpp.

ASCII A/B records: data-start detection ladder (1024 new format with
the 1025-byte-record newline probe, 893 undocumented, 918 latest
A-record, 864 old format — LoadFromFile:560-618), Fortran 'D' exponents
(DConvert), coordinate system at 156 (0 geographic / 1 UTM / 2 state
plane), ground/vertical units at 528, dx/dy/vres at 816 (12 chars
each), the four SW/NW/NE/SE corners at 546 (24-char pairs), profile
count at 858, horizontal datum code at 890 (new format only).

Geotransform: geographic corners are arc-seconds / 3600 with half-pixel
outsets; UTM/state-plane y extents snap modulus the pixel size and the
x origin comes from the FIRST profile's x-start (:720-760). Profiles
are column records (row#, col#, n points, 1, x-start, y-start,
elev-offset, min, max, then n ints), written south-to-north with the
lygap vertical anchoring of IReadBlock:360-505; int16 output when the
vertical unit is meters and vres >= 1, float32 otherwise; nodata
-32767; new-format records re-align to 1024-byte boundaries.
"""

from __future__ import annotations

import re

import numpy as np

NODATA = -32767


class _Tok:
    """Whitespace-token scanner over the ASCII body (the reference's
    buffered USGSDEMReadIntFromBuffer / ...DoubleFromBuffer)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos

    def int_(self) -> int:
        n = len(self.data)
        while self.pos < n and self.data[self.pos:self.pos + 1].isspace():
            self.pos += 1
        m = re.match(rb"[-+]?\d+", self.data[self.pos:self.pos + 32])
        if not m:
            raise ValueError(f"int token expected at {self.pos}")
        self.pos += m.end()
        return int(m.group(0))

    def dbl(self, nchars: int) -> float:
        raw = self.data[self.pos:self.pos + nchars]
        self.pos += nchars
        return float(raw.replace(b"D", b"E").strip() or b"0")


def _dconv(data: bytes, pos: int, n: int) -> float:
    return float(data[pos:pos + n].replace(b"D", b"E").strip() or b"0")


def _int_at(data: bytes, pos: int) -> int:
    m = re.match(rb"\s*([-+]?\d+)", data[pos:pos + 32])
    return int(m.group(1)) if m else -(10 ** 9)


def read_usgsdem(data: bytes) -> dict:
    data = bytes(data)

    # data-start detection ladder
    t = _Tok(data, 864)
    try:
        r864, c864 = t.int_(), t.int_()
        new_format = t.pos >= 1024 or r864 != 1 or c864 != 1
    except ValueError:
        new_format = True
    if new_format:
        probe = _Tok(data, 1024)
        try:
            i, j = probe.int_(), probe.int_()
        except ValueError:
            i, j = 0, 0
        if i == 1 and j in (0, 1):
            start = 1024
            if (data[1024:1025] == b"\n"
                    and data[2049:2050] == b"\n"):
                start = 1025  # 1025-byte records (#5007)
        else:
            probe = _Tok(data, 893)
            try:
                i, j = probe.int_(), probe.int_()
            except ValueError:
                i, j = 0, 0
            if i == 1 and j == 1:
                start = 893
            else:
                probe = _Tok(data, 918)
                i, j = probe.int_(), probe.int_()
                if i != 1 or j != 1:
                    raise ValueError("does not appear to be a USGS DEM file")
                start = 918
    else:
        start = 864

    coord_sys = _int_at(data, 156)
    utm_zone = _int_at(data, 162)
    g_unit = _int_at(data, 528)
    v_unit = _int_at(data, 534)
    dx = _dconv(data, 816, 12)
    dy = _dconv(data, 828, 12)
    vres = _dconv(data, 840, 12)
    if dy == 0:
        raise ValueError("zero y resolution")
    is_float = v_unit == 1 or vres < 1.0

    corners = []
    pos = 546
    for _ in range(4):  # SW, NW, NE, SE
        corners.append((_dconv(data, pos, 24), _dconv(data, pos + 24, 24)))
        pos += 48
    ext_min_x = min(corners[0][0], corners[1][0])
    ext_max_x = max(corners[2][0], corners[3][0])
    ext_min_y = min(corners[0][1], corners[3][1])
    ext_max_y = max(corners[1][1], corners[2][1])

    n_profiles = _int_at(data, 858)

    datum = "NAD27"
    if new_format:
        code = _int_at(data, 890)
        datum = {1: "NAD27", 2: "WGS72", 3: "WGS84", 4: "NAD83"}.get(
            code, "NAD27"
        )

    geographic = coord_sys not in (1, 2, -9999)
    if not geographic:
        import math

        ext_min_y = math.floor(ext_min_y / dy) * dy
        ext_max_y = math.ceil(ext_max_y / dy) * dy
        probe = _Tok(data, start)
        for _ in range(4):
            probe.int_()
        dx_start = probe.dbl(24)
        ny = int((ext_max_y - ext_min_y) / dy + 1.5)
        nx = n_profiles
        gt = (dx_start - dx / 2.0, dx, 0.0,
              ext_max_y + dy / 2.0, 0.0, -dy)
    else:
        ny = int((ext_max_y - ext_min_y) / dy + 1.5)
        nx = n_profiles
        gt = ((ext_min_x - dx / 2.0) / 3600.0, dx / 3600.0, 0.0,
              (ext_max_y + dy / 2.0) / 3600.0, 0.0, -dy / 3600.0)

    arr = np.full((ny, nx), NODATA,
                  dtype=np.float32 if is_float else np.int64)
    y_min = gt[3] + (ny - 0.5) * gt[5]
    t = _Tok(data, start)
    for i in range(nx):
        try:
            t.int_()  # row number (1)
            t.int_()  # column number (i+1)
            n_pts = t.int_()
            t.int_()  # number of columns in profile (1)
            t.dbl(24)  # x start
            dy_start = t.dbl(24)
            elev_off = t.dbl(24)
            t.dbl(24)  # min
            t.dbl(24)  # max
        except ValueError:
            break  # truncated: remaining profiles stay nodata
        if geographic:
            dy_start /= 3600.0
        lygap = int((y_min - dy_start) / gt[5] + 0.5)
        for j in range(lygap, n_pts + lygap):
            iy = ny - j - 1
            try:
                elev = t.int_()
            except ValueError:
                break
            if 0 <= iy < ny and elev != NODATA:
                v = elev * vres + elev_off
                if is_float:
                    arr[iy, i] = v
                else:
                    arr[iy, i] = int(np.clip(v, -32768, 32767))
        if start == 1024:
            t.pos = (t.pos + 1023) // 1024 * 1024

    return {
        "nx": nx, "ny": ny, "gt": gt, "datum": datum,
        "units": "ft" if v_unit == 1 else "m",
        "coord_sys": coord_sys, "utm_zone": utm_zone,
        "g_unit": g_unit, "nodata": NODATA,
        "array": arr.astype(np.float32 if is_float else np.int16),
    }


def usgsdem_encode(arr: np.ndarray, lon_arcsec: float = -241200.0,
                   lat_arcsec: float = 154800.0,
                   step_arcsec: float = 3.0) -> bytes:
    """Minimal geographic new-format writer (the CreateCopy shape):
    1024-byte A record with the spec field offsets this reader and the
    reference consume, then one 1024-aligned B record per profile."""
    ny, nx = arr.shape
    a = bytearray(b" " * 1024)

    def put(pos: int, txt: str):
        a[pos:pos + len(txt)] = txt.encode()

    put(0, "gdal_spark usgsdem")
    put(156, "     0")      # geographic
    put(162, "     0")      # zone
    put(528, "     2")      # ground unit: arc-seconds
    put(534, "     2")      # vertical unit: meters
    x0, y0 = lon_arcsec, lat_arcsec
    x1 = x0 + (nx - 1) * step_arcsec
    y1 = y0 + (ny - 1) * step_arcsec
    corners = [(x0, y0), (x0, y1), (x1, y1), (x1, y0)]  # SW NW NE SE
    pos = 546
    for cx, cy in corners:
        put(pos, f"{cx:24.15E}".replace("E", "D"))
        put(pos + 24, f"{cy:24.15E}".replace("E", "D"))
        pos += 48
    put(786, f"{0.0:24.15E}")  # elev min (unused)
    put(816, f"{step_arcsec:12.6E}".replace("E", "D"))
    put(828, f"{step_arcsec:12.6E}".replace("E", "D"))
    put(840, f"{1.0:12.6E}".replace("E", "D"))
    put(852, "     1")      # rows per profile block
    put(858, f"{nx:6d}")
    put(876, "2020")
    put(890, " 3")          # WGS84
    out = bytearray(a)
    for i in range(nx):
        rec = bytearray()

        def tok(s: str):
            rec.extend(b" " + s.encode())

        tok("1")
        tok(str(i + 1))
        tok(str(ny))
        tok("1")
        rec.extend(f"{x0 + i * step_arcsec:24.15E}".replace("E", "D").encode())
        rec.extend(f"{y0:24.15E}".replace("E", "D").encode())
        rec.extend(f"{0.0:24.15E}".replace("E", "D").encode())
        col = arr[::-1, i]  # south-first
        rec.extend(f"{float(col.min()):24.15E}".replace("E", "D").encode())
        rec.extend(f"{float(col.max()):24.15E}".replace("E", "D").encode())
        for v in col:
            tok(str(int(v)))
        pad = (-len(rec)) % 1024
        rec.extend(b" " * pad)
        out += rec
    return bytes(out)
