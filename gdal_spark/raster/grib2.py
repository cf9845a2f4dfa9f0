"""GRIB edition 2 reader (pure numpy).

Section walk and data-representation templates per the WMO GRIB2
specification as unpacked by the reference (frmts/grib/degrib/g2clib):

  Section 0  'GRIB' + discipline + edition(2) + total length (u64)
  Section 1  identification
  Section 3  grid definition (templates 3.0 lat/lon, 3.10 mercator,
             3.20/3.30 polar/lambert — values decode for all; the
             geotransform is emitted for 3.0)
  Section 4  product definition (parameter category/number for the
             degrib metric unit normalization: temperature K -> C)
  Section 5  data representation: 5.0 simple, 5.2 complex,
             5.3 complex + spatial differencing, 5.4? (not supported),
             5.40/41 (jpeg/png, not supported)
  Section 6  bitmap
  Section 7  packed data

  value = (R + X * 2**E) / 10**D, missing -> 9999 under the same
  degrib reset rule as GRIB1.
"""

from __future__ import annotations

import struct

import numpy as np

GRIB_NODATA = 9999.0


def _bits(data: bytes, start_bit: int, nbits: int, count: int) -> np.ndarray:
    """Read `count` unsigned big-endian `nbits`-wide fields starting at
    absolute bit offset `start_bit`."""
    if nbits == 0 or count == 0:
        return np.zeros(count, np.int64)
    end_byte = (start_bit + count * nbits + 7) // 8
    bits = np.unpackbits(np.frombuffer(data[:end_byte], np.uint8))
    need = start_bit + count * nbits
    if bits.size < need:
        bits = np.concatenate([bits, np.zeros(need - bits.size, np.uint8)])
    sel = bits[start_bit:need].reshape(count, nbits)
    weights = (1 << np.arange(nbits - 1, -1, -1, dtype=np.int64))
    return sel.astype(np.int64) @ weights


def _sm_int(data: bytes) -> int:
    """Sign-and-magnitude big-endian signed integer."""
    if not data:
        return 0
    v = int.from_bytes(data, "big")
    top = 1 << (8 * len(data) - 1)
    return -(v & (top - 1)) if v & top else v


def _s16(b: bytes) -> int:
    return _sm_int(b[:2])


def grib2_messages(data: bytes, normalize_units: bool = True) -> list[dict]:
    out = []
    pos = 0
    n = len(data)
    while pos < n:
        idx = data.find(b"GRIB", pos)
        if idx < 0 or idx + 16 > n:
            break
        if data[idx + 7] != 2:
            pos = idx + 4
            continue
        total = struct.unpack(">Q", data[idx + 8:idx + 16])[0]
        msg = data[idx:idx + total]
        try:
            out.append(_decode_message(msg, normalize_units))
        except Exception:
            pass
        pos = idx + max(total, 16)
    return out


def _decode_message(msg: bytes, normalize_units: bool) -> dict:
    discipline = msg[6]
    p = 16
    sections: dict[int, bytes] = {}
    grids = []
    while p < len(msg) - 4:
        if msg[p:p + 4] == b"7777":
            break
        slen, snum = struct.unpack(">IB", msg[p:p + 5])
        sections[snum] = msg[p:p + slen]
        p += slen
    s3 = sections[3]
    npts = struct.unpack(">I", s3[6:10])[0]
    gtmpl = struct.unpack(">H", s3[12:14])[0]
    ni = nj = 0
    gt = None
    if gtmpl == 0:  # lat/lon
        ni, nj = struct.unpack(">II", s3[30:38])
        lat1 = struct.unpack(">i", s3[46:50])[0] / 1e6
        lon1 = struct.unpack(">i", s3[50:54])[0] / 1e6
        lat2 = struct.unpack(">i", s3[55:59])[0] / 1e6
        di = struct.unpack(">I", s3[63:67])[0] / 1e6
        dj = struct.unpack(">I", s3[67:71])[0] / 1e6
        if lon1 > 180:
            lon1 -= 360
        lat_top = max(lat1, lat2)
        gt = (lon1 - di / 2, di, 0.0, lat_top + dj / 2, 0.0, -dj)
        scan = s3[71]
    elif gtmpl in (10, 20, 30, 31):  # mercator / polar / lambert
        ni, nj = struct.unpack(">II", s3[30:38])
        scan = s3[59] if gtmpl == 10 else s3[64]
    else:
        raise ValueError(f"GRIB2 grid template {gtmpl} not supported")
    if ni * nj != npts:
        ni, nj = npts, 1
    s4 = sections[4]
    category = s4[9]
    number = s4[10]
    s5 = sections[5]
    drs = struct.unpack(">H", s5[9:11])[0]
    bitmap = None
    if 6 in sections:
        s6 = sections[6]
        if s6[5] == 0:  # bitmap present
            bits = np.unpackbits(np.frombuffer(s6[6:], np.uint8))
            bitmap = bits[:npts].astype(bool)
    s7 = sections[7]
    nvalid = int(bitmap.sum()) if bitmap is not None else npts
    rmiss = None
    if drs == 0:
        vals, miss_mask = _unpack_simple(s5, s7, nvalid)
    elif drs in (2, 3):
        vals, miss_mask, rmiss = _unpack_complex(s5, s7, nvalid, drs)
    elif drs == 4:  # IEEE float
        prec = s5[11]
        dt = {1: ">f4", 2: ">f8"}[prec]
        vals = np.frombuffer(s7, dt, nvalid, 5).astype(np.float64)
        miss_mask = np.zeros(nvalid, bool)
    else:
        raise ValueError(f"GRIB2 DRS template {drs} not supported")
    # degrib metric normalization: temperature K -> C (unit conversion
    # applies to data values, never to embedded missing substitutes)
    unit_b = 0.0
    if normalize_units and discipline == 0 and category == 0 \
            and number in (0, 1, 2, 3, 4, 5, 6, 7, 21):
        unit_b = -273.15
    vals = np.where(miss_mask, vals, vals + unit_b)
    if rmiss is not None:
        nodata = rmiss  # template-declared primary missing value
    else:
        vmin = float(vals[~miss_mask].min()) if (~miss_mask).any() else 0.0
        vmax = float(vals[~miss_mask].max()) if (~miss_mask).any() else 0.0
        if vmax < GRIB_NODATA or vmin > GRIB_NODATA:
            nodata = GRIB_NODATA
        else:
            nodata = 9.999e20
        vals = np.where(miss_mask, nodata, vals)
    if bitmap is not None:
        full = np.full(npts, nodata, np.float64)
        full[bitmap] = vals[:int(bitmap.sum())]
    else:
        full = vals[:npts]
    if scan & 0x20:  # consecutive points run in the j direction
        arr = np.ascontiguousarray(full.reshape(ni, nj).T)
    else:
        arr = full.reshape(nj, ni)
    if scan & 0x10:  # boustrophedon: adjacent rows scan opposite ways
        arr = arr.copy()
        arr[1::2] = arr[1::2, ::-1]
    if scan & 0x80:
        arr = arr[:, ::-1]
    if scan & 0x40:  # +j scan: south-to-north -> flip to north-up
        arr = arr[::-1]
    return {
        "array": np.ascontiguousarray(arr),
        "gt": gt,
        "nodata": nodata,
        "discipline": discipline,
        "category": category,
        "number": number,
        "grid_template": gtmpl,
        "drs_template": drs,
    }


def _g2_scale(xs: np.ndarray, ref: float, E: int, D: int) -> np.ndarray:
    """g2clib value formula IN FLOAT32: fld = (ifld*bscale + ref)*dscale
    with bscale = 2**E and dscale = 10**-D clamped to float."""
    bscale = np.float32(2.0 ** E)
    dscale = np.float32(10.0 ** (-D))
    f = (xs.astype(np.float32) * bscale + np.float32(ref)) * dscale
    return f.astype(np.float64)


def _unpack_simple(s5: bytes, s7: bytes, nvalid: int
                   ) -> tuple[np.ndarray, np.ndarray]:
    ref, = struct.unpack(">f", s5[11:15])
    E = _s16(s5[15:17])
    D = _s16(s5[17:19])
    nbits = s5[19]
    xs = _bits(s7[5:], 0, nbits, nvalid) if nbits else np.zeros(nvalid,
                                                                np.int64)
    return _g2_scale(xs, ref, E, D), np.zeros(nvalid, bool)


def _unpack_complex(s5: bytes, s7: bytes, nvalid: int, drs: int
                    ) -> tuple[np.ndarray, np.ndarray]:
    """DRS 5.2 (complex) / 5.3 (complex + spatial differencing), data
    template 7.2/7.3 group-split unpacking — transcribed from the
    g2clib comunpack semantics: a BIT-packed (not byte-aligned)
    spatial-diff preamble (od unsigned ivals + sign bit + magnitude),
    per-field relative byte padding after the refs/widths/lengths
    vectors, missing markers compacted out before differencing, and
    float32 scaling."""
    ref, = struct.unpack(">f", s5[11:15])
    E = _s16(s5[15:17])
    D = _s16(s5[17:19])
    nbits = s5[19]
    itype = s5[20]
    miss_mgmt = s5[22]
    if miss_mgmt == 0:
        rmiss1 = rmiss2 = None
    elif itype == 0:
        rmiss1, = struct.unpack(">f", s5[23:27])
        rmiss2, = struct.unpack(">f", s5[27:31])
    else:
        rmiss1 = float(struct.unpack(">i", s5[23:27])[0])
        rmiss2 = float(struct.unpack(">i", s5[27:31])[0])
    ng, = struct.unpack(">I", s5[31:35])
    gw_ref = s5[35]
    gw_bits = s5[36]
    gl_ref, = struct.unpack(">I", s5[37:41])
    gl_inc = s5[41]
    last_len, = struct.unpack(">I", s5[42:46])
    gl_bits = s5[46]
    body = s7[5:]
    if ng == 0:
        return np.full(nvalid, ref, np.float64), np.zeros(nvalid, bool)
    ofs = 0
    od = 0
    minsd = 0
    ival1 = ival2 = 0
    if drs == 3:
        od = s5[47]
        nbitsd = s5[48] * 8
        if nbitsd:
            ival1 = int(_bits(body, ofs, nbitsd, 1)[0])
            ofs += nbitsd
            if od == 2:
                ival2 = int(_bits(body, ofs, nbitsd, 1)[0])
                ofs += nbitsd
            sign = int(_bits(body, ofs, 1, 1)[0])
            ofs += 1
            minsd = int(_bits(body, ofs, nbitsd - 1, 1)[0])
            ofs += nbitsd - 1
            if sign:
                minsd = -minsd

    def _field(width: int, count: int) -> np.ndarray:
        nonlocal ofs
        if width == 0:
            return np.zeros(count, np.int64)
        v = _bits(body, ofs, width, count)
        used = width * count
        ofs += used
        if used % 8:
            ofs += 8 - used % 8
        return v

    grefs = _field(nbits, ng)
    gwidths = gw_ref + _field(gw_bits, ng)
    glens = gl_ref + gl_inc * _field(gl_bits, ng)
    glens[-1] = last_len
    total = int(glens.sum())
    ifld = np.empty(total, np.int64)
    missf = np.zeros(total, np.uint8)
    non = 0
    n = 0
    for g in range(ng):
        w = int(gwidths[g])
        ln = int(glens[g])
        gr = int(grefs[g])
        if w != 0:
            v = _bits(body, ofs, w, ln)
            ofs += w * ln
            if miss_mgmt:
                m1 = (1 << w) - 1
                is_m1 = v == m1
                is_m2 = (v == m1 - 1) if miss_mgmt == 2 else \
                    np.zeros(ln, bool)
                missf[n:n + ln] = np.where(is_m1, 1,
                                           np.where(is_m2, 2, 0))
                keep = v[~(is_m1 | is_m2)] + gr
                ifld[non:non + keep.size] = keep
                non += keep.size
            else:
                ifld[n:n + ln] = v + gr
                non = n + ln
        else:
            if miss_mgmt:
                m1 = (1 << nbits) - 1 if nbits else -1
                if gr == m1:
                    missf[n:n + ln] = 1
                elif miss_mgmt == 2 and gr == m1 - 1:
                    missf[n:n + ln] = 2
                else:
                    ifld[non:non + ln] = gr
                    non += ln
            else:
                ifld[n:n + ln] = gr
                non = n + ln
        n += ln
    if drs == 3 and od:
        work = ifld[:non]
        if od == 1 and work.size:
            work[0] = ival1
            if work.size > 1:
                work[1:] += minsd
            work = np.cumsum(work)
        elif od == 2 and work.size >= 2:
            work[0] = ival1
            work[1] = ival2
            if work.size > 2:
                work[2:] += minsd
            # f[i] = d[i] + 2 f[i-1] - f[i-2]: double integration
            fd = np.cumsum(
                np.concatenate([[work[1] - work[0]], work[2:]])
            )
            work = np.concatenate([[work[0]], work[0] + np.cumsum(fd)])
        ifld = np.concatenate([work, ifld[non:]])
    # scatter compacted values back over the missing mask
    vals = np.empty(total, np.float64)
    miss = missf != 0
    good = _g2_scale(ifld[:non], ref, E, D)
    vals[~miss] = good[: (~miss).sum()]
    if rmiss1 is not None:
        vals[missf == 1] = rmiss1
    if rmiss2 is not None:
        vals[missf == 2] = rmiss2
    if total < nvalid:
        vals = np.concatenate([vals, np.zeros(nvalid - total)])
        miss = np.concatenate([miss, np.zeros(nvalid - total, bool)])
    return vals[:nvalid], miss[:nvalid], (float(rmiss1)
                                          if rmiss1 is not None else None)
