"""Coordinate reference systems beyond the 4326<->3857 pair.

Ellipsoidal Transverse Mercator (UTM zones EPSG:326xx / 327xx) via the
Krueger series in the transformed-variables form (Karney 2011, "Transverse
Mercator with an accuracy of a few nanometers" — the same 6th-order series
PROJ's etmerc uses), fully vectorized numpy. Sub-millimeter accuracy
within the UTM zone width, so it replaces per-point PROJ calls for the
cases the engine meets (the reference's own warp benchmark is
EPSG:32631 -> EPSG:4326, autotest/benchmark/test_gdalwarp.py:24; general
CRS plumbing in GDAL is ogr/ogrct.cpp:1788 via PROJ).

A generic `transform(src, dst, x, y)` composes any supported pair through
the EPSG:4326 hub. All formulas are published (Karney 2011 eqs. 7-35;
also the "flattening series" on standard references).
"""

from __future__ import annotations

import math

import numpy as np

# WGS84
_A = 6378137.0
_F = 1.0 / 298.257223563
_N = _F / (2.0 - _F)
_N2 = _N * _N
_N3 = _N2 * _N
_N4 = _N3 * _N
_N5 = _N4 * _N
_N6 = _N5 * _N

# rectifying radius  A = a/(1+n) (1 + n^2/4 + n^4/64 + n^6/256)
_ABAR = _A / (1.0 + _N) * (1.0 + _N2 / 4.0 + _N4 / 64.0 + _N6 / 256.0)

# Karney 2011 eq. 12 (forward, alpha) / eq. 21 (inverse, beta) /
# eq. 22 (conformal -> geographic latitude, delta), order n^6
_ALPHA = (
    _N / 2 - 2 * _N2 / 3 + 5 * _N3 / 16 + 41 * _N4 / 180 - 127 * _N5 / 288 + 7891 * _N6 / 37800,
    13 * _N2 / 48 - 3 * _N3 / 5 + 557 * _N4 / 1440 + 281 * _N5 / 630 - 1983433 * _N6 / 1935360,
    61 * _N3 / 240 - 103 * _N4 / 140 + 15061 * _N5 / 26880 + 167603 * _N6 / 181440,
    49561 * _N4 / 161280 - 179 * _N5 / 168 + 6601661 * _N6 / 7257600,
    34729 * _N5 / 80640 - 3418889 * _N6 / 1995840,
    212378941 * _N6 / 319334400,
)
_BETA = (
    _N / 2 - 2 * _N2 / 3 + 37 * _N3 / 96 - _N4 / 360 - 81 * _N5 / 512 + 96199 * _N6 / 604800,
    _N2 / 48 + _N3 / 15 - 437 * _N4 / 1440 + 46 * _N5 / 105 - 1118711 * _N6 / 3870720,
    17 * _N3 / 480 - 37 * _N4 / 840 - 209 * _N5 / 4480 + 5569 * _N6 / 90720,
    4397 * _N4 / 161280 - 11 * _N5 / 504 - 830251 * _N6 / 7257600,
    4583 * _N5 / 161280 - 108847 * _N6 / 3991680,
    20648693 * _N6 / 638668800,
)
_DELTA = (
    2 * _N - 2 * _N2 / 3 - 2 * _N3 + 116 * _N4 / 45 + 26 * _N5 / 45 - 2854 * _N6 / 675,
    7 * _N2 / 3 - 8 * _N3 / 5 - 227 * _N4 / 45 + 2704 * _N5 / 315 + 2323 * _N6 / 945,
    56 * _N3 / 15 - 136 * _N4 / 35 - 1262 * _N5 / 105 + 73814 * _N6 / 2835,
    4279 * _N4 / 630 - 332 * _N5 / 35 - 399572 * _N6 / 14175,
    4174 * _N5 / 315 - 144838 * _N6 / 6237,
    601676 * _N6 / 22275,
)

_K0 = 0.9996  # UTM scale on the central meridian
_FE = 500000.0  # false easting
_FN_SOUTH = 10000000.0

# 2 sqrt(n) / (1 + n) — the conformal-latitude constant (Karney eq. 9)
_E2SN = 2.0 * math.sqrt(_N) / (1.0 + _N)


def tmerc_forward(lon: np.ndarray, lat: np.ndarray, lon0_deg: float):
    """(lon, lat) degrees -> unscaled transverse-mercator (xi, eta) then
    easting/northing WITHOUT false offsets: returns (x, y) in meters with
    x = k0*A*eta, y = k0*A*xi (Karney 2011 eqs. 7-11)."""
    lam = np.deg2rad(np.asarray(lon, np.float64) - lon0_deg)
    phi = np.deg2rad(np.asarray(lat, np.float64))
    s = np.sin(phi)
    # conformal latitude: tau' = sinh(asinh(tan) - e*atanh(e*sin)) form,
    # evaluated through atanh(sin) which is stable away from the poles
    t = np.sinh(np.arctanh(s) - _E2SN * np.arctanh(_E2SN * s))
    xi_p = np.arctan2(t, np.cos(lam))
    eta_p = np.arcsinh(np.sin(lam) / np.hypot(t, np.cos(lam)))
    xi = xi_p.copy()
    eta = eta_p.copy()
    for j, a in enumerate(_ALPHA, start=1):
        xi += a * np.sin(2 * j * xi_p) * np.cosh(2 * j * eta_p)
        eta += a * np.cos(2 * j * xi_p) * np.sinh(2 * j * eta_p)
    return _K0 * _ABAR * eta, _K0 * _ABAR * xi


def tmerc_inverse(x: np.ndarray, y: np.ndarray, lon0_deg: float):
    """Inverse of tmerc_forward (Karney 2011 eqs. 19-22)."""
    eta = np.asarray(x, np.float64) / (_K0 * _ABAR)
    xi = np.asarray(y, np.float64) / (_K0 * _ABAR)
    xi_p = xi.copy()
    eta_p = eta.copy()
    for j, b in enumerate(_BETA, start=1):
        xi_p -= b * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        eta_p -= b * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
    chi = np.arcsin(np.sin(xi_p) / np.cosh(eta_p))
    phi = chi.copy()
    for j, d in enumerate(_DELTA, start=1):
        phi += d * np.sin(2 * j * chi)
    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    return np.rad2deg(lam) + lon0_deg, np.rad2deg(phi)


def _parse_utm(code: str) -> tuple[float, float] | None:
    """EPSG:326zz / 327zz -> (central meridian deg, false northing)."""
    if not code.startswith("EPSG:"):
        return None
    try:
        num = int(code[5:])
    except ValueError:
        return None
    if 32601 <= num <= 32660:
        return (num - 32600) * 6.0 - 183.0, 0.0
    if 32701 <= num <= 32760:
        return (num - 32700) * 6.0 - 183.0, _FN_SOUTH
    return None


def utm_forward(lon: np.ndarray, lat: np.ndarray, code: str):
    lon0, fn = _parse_utm(code)  # type: ignore[misc]
    x, y = tmerc_forward(lon, lat, lon0)
    return x + _FE, y + fn


def utm_inverse(e: np.ndarray, n: np.ndarray, code: str):
    lon0, fn = _parse_utm(code)  # type: ignore[misc]
    return tmerc_inverse(np.asarray(e, np.float64) - _FE, np.asarray(n, np.float64) - fn, lon0)


def utm_zone_epsg(lon: float, lat: float) -> str:
    """The UTM zone EPSG code containing a lon/lat point."""
    zone = int((lon + 180.0) // 6.0) + 1
    zone = min(max(zone, 1), 60)
    return f"EPSG:{(32600 if lat >= 0 else 32700) + zone}"


# --------------------------------------------------------------------------
# generic pair dispatch through the EPSG:4326 hub
# --------------------------------------------------------------------------


def _to_4326(code: str, x: np.ndarray, y: np.ndarray):
    if code == "EPSG:4326":
        return x, y
    if code == "EPSG:3857":
        from gdal_spark.raster.warp import meters_to_lonlat_np

        return meters_to_lonlat_np(x, y)
    if _parse_utm(code):
        return utm_inverse(x, y, code)
    raise ValueError(f"unsupported CRS {code}")


def _from_4326(code: str, lon: np.ndarray, lat: np.ndarray):
    if code == "EPSG:4326":
        return lon, lat
    if code == "EPSG:3857":
        from gdal_spark.raster.warp import lonlat_to_meters_np

        return lonlat_to_meters_np(lon, lat)
    if _parse_utm(code):
        return utm_forward(lon, lat, code)
    raise ValueError(f"unsupported CRS {code}")


def supported(code: str) -> bool:
    return code in ("EPSG:4326", "EPSG:3857") or _parse_utm(code) is not None


def transform(src: str, dst: str, x: np.ndarray, y: np.ndarray):
    """Array transform src -> dst through the 4326 hub (OGRCreateCoordinate
    Transformation role, ogr/ogrct.cpp:1788, for the supported CRS set)."""
    lon, lat = _to_4326(src, np.asarray(x, np.float64), np.asarray(y, np.float64))
    return _from_4326(dst, lon, lat)


def inverse_transform_fn(src: str, dst: str):
    """dst coords -> src coords callable (the direction inverse-mapping
    warp needs); None if either CRS is unsupported."""
    if not (supported(src) and supported(dst)):
        return None
    return lambda gx, gy: transform(dst, src, gx, gy)
