"""GRIB edition 1 reader (pure numpy).

Message layout per the WMO FM 92-VIII Ext. GRIB specification as
dispatched by the reference driver (frmts/grib, degrib's grib1 path):

  IS   'GRIB' + total length (3) + edition (1 byte, == 1)
  PDS  length(3) table(1) center(1) process(1) grid(1) flag(1)
       parameter(1) level type(1) level(2) yy mm dd hh mn
       time-unit p1 p2 time-range ... decimal scale D (signed
       sign-magnitude int16 at PDS offset 26)
  GDS  (flag bit 7) length(3) NV PV type(1 at offset 5);
       type 0/10 lat-lon: Ni(2) Nj(2) lat1(s3) lon1(s3) resflags(1)
       lat2(s3) lon2(s3) di(2) dj(2) scan(1) — millidegrees
  BMS  (flag bit 6) length(3) unused-bits(1) table(2) bitmap
  BDS  length(3) flags(1) E = binary scale (signed s16)
       R = reference (IBM 32-bit float) bits-per-value(1) packed data

  value = (R + X * 2**E) / 10**D ; bitmap gaps -> 9999 (degrib
  UNDEFINED), the reference's GRIB nodata.
"""

from __future__ import annotations

import struct

import numpy as np

GRIB_NODATA = 9999.0


def _s16(b: bytes) -> int:
    """GRIB sign-and-magnitude 16-bit."""
    v = (b[0] << 8) | b[1]
    return -(v & 0x7FFF) if v & 0x8000 else v


def _s24(b: bytes) -> int:
    v = (b[0] << 16) | (b[1] << 8) | b[2]
    return -(v & 0x7FFFFF) if v & 0x800000 else v


def _u24(b: bytes) -> int:
    return (b[0] << 16) | (b[1] << 8) | b[2]


def _ibm_float(b: bytes) -> float:
    sign = -1.0 if b[0] & 0x80 else 1.0
    exp = b[0] & 0x7F
    mant = (b[1] << 16) | (b[2] << 8) | b[3]
    if mant == 0 and exp == 0:
        return 0.0
    return sign * mant * 16.0 ** (exp - 64) / 2.0 ** 24


def _unpack_bits(data: bytes, nbits: int, count: int) -> np.ndarray:
    if nbits == 0:
        return np.zeros(count, np.int64)
    bits = np.unpackbits(np.frombuffer(data, np.uint8))
    need = count * nbits
    if bits.size < need:
        bits = np.concatenate([bits, np.zeros(need - bits.size, np.uint8)])
    bits = bits[:need].reshape(count, nbits)
    weights = (1 << np.arange(nbits - 1, -1, -1, dtype=np.int64))
    return bits.astype(np.int64) @ weights


def grib1_messages(data: bytes) -> list[dict]:
    """Split a (possibly multi-message, possibly prefixed) file into
    decoded GRIB1 messages: {'array', 'gt', 'nodata', 'parameter',
    'level_type', 'level', 'grid_type'}."""
    out = []
    pos = 0
    n = len(data)
    while pos < n:
        idx = data.find(b"GRIB", pos)
        if idx < 0:
            break
        if idx + 8 > n:
            break
        total = _u24(data[idx + 4:idx + 7])
        edition = data[idx + 7]
        if edition != 1:
            pos = idx + 4
            continue
        msg = data[idx:idx + total]
        try:
            out.append(_decode_message(msg))
        except Exception:
            pass
        pos = idx + max(total, 8)
    return out


def _decode_message(msg: bytes) -> dict:
    p = 8  # after IS
    pds_len = _u24(msg[p:p + 3])
    pds = msg[p:p + pds_len]
    flag = pds[7]
    parameter = pds[8]
    level_type = pds[9]
    level = (pds[10] << 8) | pds[11]
    dscale = _s16(pds[26:28]) if pds_len >= 28 else 0
    p += pds_len
    gds = None
    if flag & 0x80:
        gds_len = _u24(msg[p:p + 3])
        gds = msg[p:p + gds_len]
        p += gds_len
    bitmap = None
    if flag & 0x40:
        bms_len = _u24(msg[p:p + 3])
        unused = msg[p + 3]
        table = (msg[p + 4] << 8) | msg[p + 5]
        if table == 0:
            bits = np.unpackbits(
                np.frombuffer(msg[p + 6:p + bms_len], np.uint8)
            )
            total_bits = (bms_len - 6) * 8 - unused
            bitmap = bits[:total_bits].astype(bool)
        p += bms_len
    if gds is None:
        raise ValueError("GRIB1 without GDS not supported")
    gtype = gds[5]
    if gtype not in (0, 10, 4):  # lat/lon, rotated lat/lon, gaussian
        raise ValueError(f"GRIB1 grid type {gtype} not supported")
    ni = (gds[6] << 8) | gds[7]
    nj = (gds[8] << 8) | gds[9]
    lat1 = _s24(gds[10:13]) / 1000.0
    lon1 = _s24(gds[13:16]) / 1000.0
    lat2 = _s24(gds[17:20]) / 1000.0
    lon2 = _s24(gds[20:23]) / 1000.0
    di = ((gds[23] << 8) | gds[24]) / 1000.0
    dj = ((gds[25] << 8) | gds[26]) / 1000.0
    scan = gds[27]
    # BDS
    bds_len = _u24(msg[p:p + 3])
    bds = msg[p:p + bds_len]
    bflags = bds[3]
    if bflags & 0x40:
        raise ValueError("GRIB1 second-order packing not supported")
    unused_bits = bflags & 0x0F
    escale = _s16(bds[4:6])
    ref = _ibm_float(bds[6:10])
    nbits = bds[10]
    npts = ni * nj
    nvalid = int(bitmap.sum()) if bitmap is not None else npts
    packed = bds[11:]
    xs = _unpack_bits(packed, nbits, nvalid) if nbits else \
        np.zeros(nvalid, np.int64)
    vals = (ref + xs.astype(np.float64) * 2.0 ** escale) / 10.0 ** dscale
    nodata = GRIB_NODATA
    if bitmap is not None:
        # degrib ReadGrib1Sect4 missing-value rule: grid min is the
        # CONVERTED REFERENCE VALUE (not the data minimum); the primary
        # missing value resets from 9.999e20 to 9999 only when the
        # [min, max] range doesn't straddle 9999
        vmin = ref / 10.0 ** dscale
        vmax = float(vals.max()) if vals.size else vmin
        if vmax < GRIB_NODATA or vmin > GRIB_NODATA:
            nodata = GRIB_NODATA
        elif vmax >= 9.999e20 and vmin <= 9.999e20:
            nodata = vmax + 1
        else:
            nodata = 9.999e20
        full = np.full(npts, nodata, np.float64)
        full[bitmap[:npts]] = vals[: bitmap[:npts].sum()]
    else:
        full = vals[:npts]
    if scan & 0x20:  # consecutive points run in the j direction
        arr = np.ascontiguousarray(full.reshape(ni, nj).T)
    else:
        arr = full.reshape(nj, ni)
    # scan mode: bit 7 = -i direction, bit 6 = +j (south to north),
    # bit 4 = boustrophedon (adjacent rows opposite ways)
    if scan & 0x10:
        arr = arr.copy()
        arr[1::2] = arr[1::2, ::-1]
    if scan & 0x80:
        arr = arr[:, ::-1]
    north_first = not (scan & 0x40)
    if not north_first:
        arr = arr[::-1]
    lat_top = max(lat1, lat2)
    lon_w = lon1
    gt = (lon_w - di / 2.0, di, 0.0, lat_top + dj / 2.0, 0.0, -dj)
    return {
        "array": np.ascontiguousarray(arr),
        "gt": gt,
        "nodata": nodata if bitmap is not None else GRIB_NODATA,
        "parameter": parameter,
        "level_type": level_type,
        "level": level,
        "grid_type": gtype,
    }
