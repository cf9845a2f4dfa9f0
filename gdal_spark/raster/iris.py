"""IRIS (Vaisala Sigmet weather radar) driver
(frmts/iris/irisdataset.cpp — re-derived).

Facts transcribed:
  identify      product-header id 27 + ingest-header id 26 + sane
                product code / date (:731-757)
  layout        640-byte header; band b, row r (bottom-up) at
                640 + b*W*H*len + (H-1-r)*W*len  (:243-270)
  value ladder  dBZ/dBT (v-64)/2 with 95.5 -> -9999; dBZ2/DBT2
                (u16-32768)/100; FLIQUID2 exp/mantissa; VIL2; HEIGHT;
                VEL via the Nyquist velocity; SHEAR (:277-390)
  georef        equatorial radius (cm) + inverse flattening (1e-6)
                at 220/224 of the product-end block; binary angles
                360/2^32; Mercator gt via Vincenty direct geodesics
                east/north of the center + ellipsoidal Mercator
                forward; AEQD/other use radar-centered scale directly
                (:460-600)
  metadata      product/type tables, site/task names, radar/ground
                heights, composited mask, PRF/wavelength/Nyquist,
                CAPPI/PPI/RAIN/VIL/TOPS/MAX product-dependent blocks
"""

from __future__ import annotations

import math
import struct

import numpy as np

__all__ = ["iris_decode"]

PRODUCT_NAMES = [
    "", "PPI", "RHI", "CAPPI", "CROSS", "TOPS", "TRACK", "RAIN1", "RAINN",
    "VVP", "VIL", "SHEAR", "WARN", "CATCH", "RTI", "RAW", "MAX", "USER",
    "USERV", "OTHER", "STATUS", "SLINE", "WIND", "BEAM", "TEXT", "FCAST",
    "NDOP", "IMAGE", "COMP", "TDWR", "GAGE", "DWELL", "SRI", "BASE", "HMAX",
]

DATA_TYPE_CODES = [
    "XHDR", "DBT", "dBZ", "VEL", "WIDTH", "ZDR", "ORAIN", "dBZC", "DBT2",
    "dBZ2", "VEL2", "WIDTH2", "ZDR2", "RAINRATE2", "KDP", "KDP2", "PHIDP",
    "VELC", "SQI", "RHOHV", "RHOHV2", "dBZC2", "VELC2", "SQI2", "PHIDP2",
    "LDRH", "LDRH2", "LDRV", "LDRV2", "FLAGS", "FLAGS2", "FLOAT32",
    "HEIGHT", "VIL2", "NULL", "SHEAR", "DIVERGE2", "FLIQUID2", "USER",
    "OTHER", "DEFORM2", "VVEL2", "HVEL2", "HDIR2", "AXDIL2", "TIME2",
    "RHOH", "RHOH2", "RHOV", "RHOV2", "PHIH", "PHIH2", "PHIV", "PHIV2",
    "USER2", "HCLASS", "HCLASS2", "ZDRC", "ZDRC2", "TEMPERATURE16",
    "VIR16", "DBTV8", "DBTV16", "DBZV8", "DBZV16", "SNR8", "SNR16",
    "ALBEDO8", "ALBEDO16", "VILD16", "TURB16",
]

DATA_TYPES = [
    "Extended Headers", "Total H power (1 byte)",
    "Clutter Corrected H reflectivity (1 byte)", "Velocity (1 byte)",
    "Width (1 byte)", "Differential reflectivity (1 byte)",
    "Old Rainfall rate (stored as dBZ)",
    "Fully corrected reflectivity (1 byte)",
    "Uncorrected reflectivity (2 byte)", "Corrected reflectivity (2 byte)",
    "Velocity (2 byte)", "Width (2 byte)",
    "Differential reflectivity (2 byte)", "Rainfall rate (2 byte)",
    "Kdp (specific differential phase)(1 byte)",
    "Kdp (specific differential phase)(2 byte)",
    "PHIdp (differential phase)(1 byte)", "Corrected Velocity (1 byte)",
    "SQI (1 byte)", "RhoHV(0) (1 byte)", "RhoHV(0) (2 byte)",
    "Fully corrected reflectivity (2 byte)", "Corrected Velocity (2 byte)",
    "SQI (2 byte)", "PHIdp (differential phase)(2 byte)",
    "LDR H to V (1 byte)", "LDR H to V (2 byte)", "LDR V to H (1 byte)",
    "LDR V to H (2 byte)", "Individual flag bits for each bin", "",
    "Test of floating format", "Height (1/10 km) (1 byte)",
    "Linear liquid (.001mm) (2 byte)", "Data type is not applicable",
    "Wind Shear (1 byte)", "Divergence (.001 10**-4) (2-byte)",
    "Floated liquid (2 byte)", "User type, unspecified data (1 byte)",
    "Unspecified data, no color legend",
    "Deformation (.001 10**-4) (2-byte)",
    "Vertical velocity (.01 m/s) (2-byte)",
    "Horizontal velocity (.01 m/s) (2-byte)",
    "Horizontal wind direction (.1 degree) (2-byte)",
    "Axis of Dillitation (.1 degree) (2-byte)",
    "Time of data (seconds) (2-byte)", "Rho H to V (1 byte)",
    "Rho H to V (2 byte)", "Rho V to H (1 byte)", "Rho V to H (2 byte)",
    "Phi H to V (1 byte)", "Phi H to V (2 byte)", "Phi V to H (1 byte)",
    "Phi V to H (2 byte)", "User type, unspecified data (2 byte)",
    "Hydrometeor class (1 byte)", "Hydrometeor class (2 byte)",
    "Corrected Differential reflectivity (1 byte)",
    "Corrected Differential reflectivity (2 byte)", "Temperature (2 byte)",
    "Vertically Integrated Reflectivity (2 byte)", "Total V Power (1 byte)",
    "Total V Power (2 byte)", "Clutter Corrected V Reflectivity (1 byte)",
    "Clutter Corrected V Reflectivity (2 byte)",
    "Signal to Noise ratio (1 byte)", "Signal to Noise ratio (2 byte)",
    "Albedo (1 byte)", "Albedo (2 byte)", "VIL Density (2 byte)",
    "Turbulence (2 byte)",
]

PROJECTIONS = [
    "Azimutal equidistant", "Mercator", "Polar Stereographic", "UTM",
    "Perspective from geosync", "Equidistant cylindrical", "Gnomonic",
    "Gauss conformal", "Lambert conformal conic",
]


def _i16(b, off):
    return struct.unpack_from("<h", b, off)[0]


def _u16(b, off):
    return struct.unpack_from("<H", b, off)[0]


def _i32(b, off):
    return struct.unpack_from("<i", b, off)[0]


def _u32(b, off):
    return struct.unpack_from("<I", b, off)[0]


def _string(b, off, n):
    raw = b[off:off + n]
    nul = raw.find(b"\x00")
    if nul != -1:
        raw = raw[:nul]
    return raw.decode("latin-1", "replace")


def _vincenty_direct(lat, lon, angle, dist, a, b, f):
    """Vincenty direct solution -> (lon2, lat2) in degrees."""
    d2r = math.pi / 180.0
    alpha1 = d2r * angle
    sin_a1, cos_a1 = math.sin(alpha1), math.cos(alpha1)
    tan_u1 = (1 - f) * math.tan(lat * d2r)
    cos_u1 = 1 / math.sqrt(1 + tan_u1 * tan_u1)
    sin_u1 = tan_u1 * cos_u1
    sigma1 = math.atan2(tan_u1, cos_a1)
    sin_alpha = cos_u1 * sin_a1
    cos_sq_alpha = 1 - sin_alpha * sin_alpha
    usq = cos_sq_alpha * (a * a - b * b) / (b * b)
    A = 1 + usq / 16384 * (4096 + usq * (-768 + usq * (320 - 175 * usq)))
    B = usq / 1024 * (256 + usq * (-128 + usq * (74 - 47 * usq)))
    sigma = dist / (b * A)
    sigma_p = 2 * math.pi
    sin_s = cos_s = cos2sm = 0.0
    for _ in range(100):
        if abs(sigma - sigma_p) <= 1e-12:
            break
        cos2sm = math.cos(2 * sigma1 + sigma)
        sin_s = math.sin(sigma)
        cos_s = math.cos(sigma)
        delta = B * sin_s * (cos2sm + B / 4 * (
            cos_s * (-1 + 2 * cos2sm * cos2sm)
            - B / 6 * cos2sm * (-3 + 4 * sin_s * sin_s)
            * (-3 + 4 * cos2sm * cos2sm)))
        sigma_p = sigma
        sigma = dist / (b * A) + delta
    tmp = sin_u1 * sin_s - cos_u1 * cos_s * cos_a1
    lat2 = math.atan2(sin_u1 * cos_s + cos_u1 * sin_s * cos_a1,
                      (1 - f) * math.sqrt(sin_alpha ** 2 + tmp * tmp))
    lam = math.atan2(sin_s * sin_a1,
                     cos_u1 * cos_s - sin_u1 * sin_s * cos_a1)
    C = f / 16 * cos_sq_alpha * (4 + f * (4 - 3 * cos_sq_alpha))
    L = lam - (1 - C) * f * sin_alpha * (
        sigma + C * sin_s * (cos2sm + C * cos_s *
                             (-1 + 2 * cos2sm * cos2sm)))
    lon2 = lon * d2r + L
    if lon2 > math.pi:
        lon2 -= 2 * math.pi
    if lon2 < -math.pi:
        lon2 += 2 * math.pi
    return lon2 / d2r, lat2 / d2r


def _mercator_fwd(lat, lon, a, f, lon0):
    d2r = math.pi / 180.0
    x = a * (lon - lon0) * d2r
    phi = lat * d2r
    if f == 0.0:
        y = a * math.log(math.tan(math.pi / 4 + phi / 2))
    else:
        e = math.sqrt(f * (2 - f))
        es = e * math.sin(phi)
        y = a * math.log(math.tan(math.pi / 4 + phi / 2)
                         * ((1 - es) / (1 + es)) ** (e / 2))
    return x, y


def _hms(seconds):
    h = seconds // 3600
    m = (seconds - h * 3600) // 60
    return h, m, seconds - h * 3600 - m * 60


def iris_decode(data: bytes) -> tuple[np.ndarray, dict]:
    if len(data) < 640:
        raise ValueError("not an IRIS file")
    if _i16(data, 0) != 27 or _i16(data, 12) != 26:
        raise ValueError("not an IRIS file")
    h = data
    w = _i32(h, 100 + 12)
    hh = _i32(h, 104 + 12)
    nbands = _i32(h, 108 + 12)
    product_code = _u16(h, 12 + 12)
    dt_code = _u16(h, 130 + 12)
    proj_code = h[146 + 12]

    two_byte = dt_code in (8, 9, 33, 37)
    dlen = 2 if two_byte else 1

    md: dict = {
        "PRODUCT_ID": str(product_code),
        "PRODUCT": PRODUCT_NAMES[product_code],
        "DATA_TYPE_CODE": DATA_TYPE_CODES[dt_code],
        "DATA_TYPE": DATA_TYPES[dt_code],
        "DATA_TYPE_INPUT_CODE": DATA_TYPE_CODES[_u16(h, 144 + 12)],
        "DATA_TYPE_INPUT": DATA_TYPES[_u16(h, 144 + 12)],
    }
    year = _i16(h, 26 + 12)
    month = _i16(h, 28 + 12)
    day = _i16(h, 30 + 12)
    for key, off in (("TIME_PRODUCT_GENERATED", 20 + 12),
                     ("TIME_INPUT_INGEST_SWEEP", 32 + 12)):
        hr, mi, se = _hms(_i32(h, off))
        md[key] = "%d-%02d-%02d %02d:%02d:%02d" % (year, month, day,
                                                   hr, mi, se)
    md["PRODUCT_SITE_NAME"] = _string(h, 320 + 12, 16)
    md["PRODUCT_SITE_IRIS_VERSION"] = _string(h, 16 + 320 + 12, 8)
    md["INGEST_SITE_NAME"] = _string(h, 90 + 320 + 12, 16)
    md["INGEST_SITE_IRIS_VERSION"] = _string(h, 24 + 320 + 12, 8)
    md["INGEST_HARDWARE_NAME"] = _string(h, 74 + 320 + 12, 16)
    md["PRODUCT_CONFIGURATION_NAME"] = _string(h, 62 + 12, 12)
    md["TASK_NAME"] = _string(h, 74 + 12, 12)
    radar_height = _i16(h, 284 + 320 + 12)
    md["RADAR_HEIGHT"] = "%d m" % radar_height
    md["GROUND_HEIGHT"] = "%d m" % (radar_height
                                    - _i16(h, 118 + 320 + 12))
    flags = _u16(h, 86 + 12)
    if (flags << 4 & 0xFFFF) >> 15 == 1:
        md["COMPOSITED_PRODUCT"] = "YES"
        md["COMPOSITED_PRODUCT_MASK"] = "0x%08x" % _u32(h, 232 + 320 + 12)
    else:
        md["COMPOSITED_PRODUCT"] = "NO"
    md["PRF"] = "%d Hz" % _i32(h, 120 + 320 + 12)
    md["WAVELENGTH"] = "%4.2f cm" % (
        np.float32(_i32(h, 148 + 320 + 12)) / np.float32(100.0))
    pol = _u16(h, 172 + 320 + 12)
    nyquist = np.float32(_i32(h, 120 + 320 + 12)) * (
        np.float32(_i32(h, 148 + 320 + 12)) / np.float32(10000.0)) \
        / np.float32(4.0)
    nyquist = float(nyquist) * {1: 2.0, 2: 3.0, 3: 4.0}.get(pol, 1.0)
    md["NYQUIST_VELOCITY"] = "%.2f m/s" % nyquist

    pname = PRODUCT_NAMES[product_code]
    if pname == "PPI":
        md["PPI_ELEVATION_ANGLE"] = "%f" % (
            _i16(h, 164 + 12) * 360.0 / 65536.0)
        md["DATA_TYPE_UNITS"] = "dBZ" if DATA_TYPE_CODES[dt_code] == "dBZ" \
            else "m/s"
    elif pname == "CAPPI":
        md["CAPPI_BOTTOM_HEIGHT"] = "%.1f m" % (_i32(h, 4 + 164 + 12) / 100.0)
        md["AZIMUTH_SMOOTHING_FOR_SHEAR"] = "%.1f" % (
            _u16(h, 10 + 164 + 12) * 360.0 / 65536.0)
        md["MAX_AGE_FOR_SHEAR_VVP_CORRECTION"] = "%d s" % _u32(
            h, 24 + 164 + 12)
        md["DATA_TYPE_UNITS"] = "dBZ" if DATA_TYPE_CODES[dt_code] == "dBZ" \
            else "m/s"
    elif pname in ("RAIN1", "RAINN"):
        md["NUM_FILES_USED"] = "%d" % _i16(h, 170 + 320 + 12)
        md["MINIMUM_Z_TO_ACCUMULATE"] = "%f" % (
            (_u32(h, 164 + 12) - 32768.0) / 10000.0)
        md["SECONDS_OF_ACCUMULATION"] = "%d s" % _u16(h, 6 + 164 + 12)
        md["SPAN_OF_INPUT_FILES"] = "%d s" % _u32(h, 24 + 164 + 12)
        md["DATA_TYPE_UNITS"] = "mm"
        md["INPUT_PRODUCT_NAME"] = _string(h, 12 + 164 + 12, 12)
        if pname == "RAINN":
            md["NUM_HOURS_ACCUMULATE"] = "%d" % _u16(h, 10 + 164 + 12)
    elif pname == "VIL":
        md["BOTTOM_OF_HEIGTH_INTERVAL"] = "%.1f m" % (
            _i32(h, 4 + 164 + 12) / 100.0)
        md["TOP_OF_HEIGTH_INTERVAL"] = "%.1f m" % (
            _i32(h, 8 + 164 + 12) / 100.0)
        md["VIL_DENSITY_NOT_AVAILABLE_VALUE"] = "-1"
        md["DATA_TYPE_UNITS"] = "mm"
    elif pname == "TOPS":
        md["Z_THRESHOLD"] = "%.1f dBZ" % (_i16(h, 4 + 164 + 12) / 16.0)
        md["ECHO_TOPS_NOT_AVAILABLE_VALUE"] = "-1"
        md["DATA_TYPE_UNITS"] = "km"
    elif pname == "MAX":
        md["BOTTOM_OF_INTERVAL"] = "%.1f m" % (_i32(h, 4 + 164 + 12) / 100.0)
        md["TOP_OF_INTERVAL"] = "%.1f m" % (_i32(h, 8 + 164 + 12) / 100.0)

    # pixel values (bottom-up rows)
    raw = np.frombuffer(data, np.uint8, w * hh * dlen * max(nbands, 1), 640)
    bands = []
    for b in range(max(nbands, 1)):
        seg = raw[b * w * hh * dlen:(b + 1) * w * hh * dlen]
        if dlen == 2:
            v = seg.view("<u2").astype(np.float32)
        else:
            v = seg.astype(np.float32)
        v = v.reshape(hh, w)[::-1]
        out = v.copy()
        if dt_code in (1, 2):
            out = (v - 64.0) / 2.0
            out[out == np.float32(95.5)] = -9999.0
        elif dt_code in (8, 9):
            out = (v - 32768.0) / 100.0
            out[np.isclose(out, 327.67)] = -9999.0
        elif dt_code == 37:
            iv = v.astype(np.uint32)
            exp = iv >> 12
            mant = iv - (exp << 12)
            out = np.where(exp == 0, mant / 1000.0,
                           ((mant + 4096) << np.maximum(exp, 1) - 1)
                           / 1000.0).astype(np.float32)
            out[iv == 65535] = -9999.0
        elif dt_code == 33:
            out = (v - 1) / 1000.0
            out[v == 0] = -1.0
            out[v == 65535] = -9999.0
        elif dt_code == 32:
            out = (v - 1.0) / 10.0
            out[v == 0] = -1.0
            out[v == 255] = -9999.0
        elif dt_code == 3:
            out = nyquist * (v - 128.0) / 127.0
            out[v == 0] = -9997.0
            out[v == 1] = -9998.0
            out[v == 255] = -9999.0
        elif dt_code == 35:
            out = (v - 128.0) * 0.2
            out[v == 0] = -9998.0
            out[v == 255] = -9999.0
        bands.append(out.astype(np.float32))
    arr = bands[0] if len(bands) == 1 else np.stack(bands, axis=-1)

    # georeferencing
    eq_radius = _u32(h, 220 + 320 + 12) / 100.0
    inv_flat = _u32(h, 224 + 320 + 12) / 1000000.0
    if eq_radius == 0.0:
        eq_radius = 6371000.0
        polar_radius = eq_radius
        flat = 0.0
    elif inv_flat == 0.0:
        flat = 0.0
        polar_radius = eq_radius
    else:
        flat = 1.0 / inv_flat
        polar_radius = eq_radius * (1.0 - flat)
    u32max = 0xFFFFFFFF
    center_lon = _u32(h, 112 + 320 + 12) * 360.0 / u32max
    center_lat = _u32(h, 108 + 320 + 12) * 360.0 / u32max
    ref_lon = _u32(h, 244 + 320 + 12) * 360.0 / u32max
    radar_x = _i32(h, 112 + 12) / 1000.0
    radar_y = _i32(h, 116 + 12) / 1000.0
    scale_x = _i32(h, 88 + 12) / 100.0
    scale_y = _i32(h, 92 + 12) / 100.0

    gt = None
    if 0 < scale_x < polar_radius and 0 < scale_y < polar_radius:
        proj = PROJECTIONS[proj_code]
        if proj == "Mercator":
            lon2, _ = _vincenty_direct(center_lat, center_lon, 90.0,
                                       scale_x, eq_radius, polar_radius,
                                       flat)
            _, lat2 = _vincenty_direct(center_lat, center_lon, 0.0,
                                       scale_y, eq_radius, polar_radius,
                                       flat)
            x, y = _mercator_fwd(center_lat, center_lon, eq_radius, flat,
                                 ref_lon)
            x2, y2 = _mercator_fwd(lat2, lon2, eq_radius, flat, ref_lon)
            gt = (x - radar_x * (x2 - x), x2 - x, 0.0,
                  y + radar_y * (y2 - y), 0.0, -(y2 - y))
        else:
            gt = (-radar_x * scale_x, scale_x, 0.0,
                  radar_y * scale_y, 0.0, -scale_y)
    meta = {"metadata": md, "nodata": -9999.0,
            "projection": PROJECTIONS[proj_code]}
    if gt is not None:
        meta["gt"] = gt
    return arr, meta
