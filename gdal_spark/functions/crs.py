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


def _tm_series(n: float):
    """Karney 2011 eq. 12 (forward, alpha) / eq. 21 (inverse, beta) /
    eq. 22 (conformal -> geographic latitude, delta) coefficient tuples at
    order n^6, plus the rectifying-radius factor A/a — parameterized over
    the third flattening so any ellipsoid (clrk66, intl, bessel, ...)
    gets the same few-nanometer series WGS84 does."""
    n2 = n * n
    n3 = n2 * n
    n4 = n3 * n
    n5 = n4 * n
    n6 = n5 * n
    alpha = (
        n / 2 - 2 * n2 / 3 + 5 * n3 / 16 + 41 * n4 / 180 - 127 * n5 / 288 + 7891 * n6 / 37800,
        13 * n2 / 48 - 3 * n3 / 5 + 557 * n4 / 1440 + 281 * n5 / 630 - 1983433 * n6 / 1935360,
        61 * n3 / 240 - 103 * n4 / 140 + 15061 * n5 / 26880 + 167603 * n6 / 181440,
        49561 * n4 / 161280 - 179 * n5 / 168 + 6601661 * n6 / 7257600,
        34729 * n5 / 80640 - 3418889 * n6 / 1995840,
        212378941 * n6 / 319334400,
    )
    beta = (
        n / 2 - 2 * n2 / 3 + 37 * n3 / 96 - n4 / 360 - 81 * n5 / 512 + 96199 * n6 / 604800,
        n2 / 48 + n3 / 15 - 437 * n4 / 1440 + 46 * n5 / 105 - 1118711 * n6 / 3870720,
        17 * n3 / 480 - 37 * n4 / 840 - 209 * n5 / 4480 + 5569 * n6 / 90720,
        4397 * n4 / 161280 - 11 * n5 / 504 - 830251 * n6 / 7257600,
        4583 * n5 / 161280 - 108847 * n6 / 3991680,
        20648693 * n6 / 638668800,
    )
    delta = (
        2 * n - 2 * n2 / 3 - 2 * n3 + 116 * n4 / 45 + 26 * n5 / 45 - 2854 * n6 / 675,
        7 * n2 / 3 - 8 * n3 / 5 - 227 * n4 / 45 + 2704 * n5 / 315 + 2323 * n6 / 945,
        56 * n3 / 15 - 136 * n4 / 35 - 1262 * n5 / 105 + 73814 * n6 / 2835,
        4279 * n4 / 630 - 332 * n5 / 35 - 399572 * n6 / 14175,
        4174 * n5 / 315 - 144838 * n6 / 6237,
        601676 * n6 / 22275,
    )
    abar_over_a = (1.0 + n2 / 4.0 + n4 / 64.0 + n6 / 256.0) / (1.0 + n)
    return alpha, beta, delta, abar_over_a


_ALPHA, _BETA, _DELTA, _ABAR_FAC = _tm_series(_N)
# rectifying radius  A = a/(1+n) (1 + n^2/4 + n^4/64 + n^6/256)
_ABAR = _A * _ABAR_FAC

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
# Conic / azimuthal / pseudocylindrical families (EPSG Guidance Note 7-2
# formulas: Lambert Conformal Conic 2SP §3.1.1.1, Albers Equal Area
# §3.1.2, Polar Stereographic §3.1.3.2, plus the spherical sinusoidal of
# the MODIS grid). Each projection is parameterized over its own
# ellipsoid (GRS80 national grids differ from WGS84 only in the 9th
# decimal of f); datum shift WGS84<->NAD83/RGF93 is treated as identity,
# the same ballpark default PROJ uses without late-binding grids.
# --------------------------------------------------------------------------

_GRS80_F = 1.0 / 298.257222101


def _m(phi, e):
    return np.cos(phi) / np.sqrt(1.0 - (e * np.sin(phi)) ** 2)


def _t(phi, e):
    s = np.sin(phi)
    return np.tan(math.pi / 4.0 - phi / 2.0) / ((1.0 - e * s) / (1.0 + e * s)) ** (e / 2.0)


def _phi_from_t(t, e, iters=12):
    phi = math.pi / 2.0 - 2.0 * np.arctan(t)
    for _ in range(iters):
        s = e * np.sin(phi)
        phi = math.pi / 2.0 - 2.0 * np.arctan(t * ((1.0 - s) / (1.0 + s)) ** (e / 2.0))
    return phi


class _LCC2SP:
    def __init__(self, a, f, lat1, lat2, lat0, lon0, fe, fn):
        self.a, self.lon0, self.fe, self.fn = a, lon0, fe, fn
        self.e = math.sqrt(2 * f - f * f)
        p1, p2, p0 = map(math.radians, (lat1, lat2, lat0))
        m1, m2 = _m(np.float64(p1), self.e), _m(np.float64(p2), self.e)
        t1, t2, t0 = (_t(np.float64(p), self.e) for p in (p1, p2, p0))
        self.n = (math.log(m1) - math.log(m2)) / (math.log(t1) - math.log(t2))
        self.F = m1 / (self.n * t1 ** self.n)
        self.rho0 = a * self.F * t0 ** self.n

    def forward(self, lon, lat):
        phi = np.deg2rad(np.asarray(lat, np.float64))
        rho = self.a * self.F * _t(phi, self.e) ** self.n
        th = self.n * np.deg2rad(np.asarray(lon, np.float64) - self.lon0)
        return self.fe + rho * np.sin(th), self.fn + self.rho0 - rho * np.cos(th)

    def inverse(self, x, y):
        dx = np.asarray(x, np.float64) - self.fe
        dy = self.rho0 - (np.asarray(y, np.float64) - self.fn)
        rho = np.sign(self.n) * np.hypot(dx, dy)
        t = (rho / (self.a * self.F)) ** (1.0 / self.n)
        th = np.arctan2(np.sign(self.n) * dx, np.sign(self.n) * dy)
        lon = np.rad2deg(th / self.n) + self.lon0
        return lon, np.rad2deg(_phi_from_t(t, self.e))


class _Albers2SP:
    def __init__(self, a, f, lat1, lat2, lat0, lon0, fe, fn):
        self.a, self.lon0, self.fe, self.fn = a, lon0, fe, fn
        e2 = 2 * f - f * f
        self.e = math.sqrt(e2)
        self.e2 = e2

        def q(phi):
            s = np.sin(phi)
            return (1.0 - e2) * (
                s / (1.0 - e2 * s * s)
                - (1.0 / (2.0 * self.e)) * np.log((1.0 - self.e * s) / (1.0 + self.e * s))
            )

        p1, p2, p0 = (np.float64(math.radians(v)) for v in (lat1, lat2, lat0))
        m1, m2 = _m(p1, self.e), _m(p2, self.e)
        q1, q2, q0 = q(p1), q(p2), q(p0)
        self.q = q
        self.n = (m1 * m1 - m2 * m2) / (q2 - q1)
        self.C = m1 * m1 + self.n * q1
        self.rho0 = a * np.sqrt(self.C - self.n * q0) / self.n

    def forward(self, lon, lat):
        phi = np.deg2rad(np.asarray(lat, np.float64))
        rho = self.a * np.sqrt(self.C - self.n * self.q(phi)) / self.n
        th = self.n * np.deg2rad(np.asarray(lon, np.float64) - self.lon0)
        return self.fe + rho * np.sin(th), self.fn + self.rho0 - rho * np.cos(th)

    def inverse(self, x, y):
        dx = np.asarray(x, np.float64) - self.fe
        dy = self.rho0 - (np.asarray(y, np.float64) - self.fn)
        rho = np.hypot(dx, dy)
        qv = (self.C - (rho * self.n / self.a) ** 2) / self.n
        th = np.arctan2(dx, dy)
        lon = np.rad2deg(th / self.n) + self.lon0
        phi = np.arcsin(np.clip(qv / 2.0, -1.0, 1.0))
        for _ in range(12):
            s = np.sin(phi)
            phi = phi + (1.0 - self.e2 * s * s) ** 2 / (2.0 * np.cos(phi)) * (
                qv / (1.0 - self.e2)
                - s / (1.0 - self.e2 * s * s)
                + (1.0 / (2.0 * self.e)) * np.log((1.0 - self.e * s) / (1.0 + self.e * s))
            )
        return lon, np.rad2deg(phi)


class _PolarStereo:
    """Variant B (standard parallel): north aspect for lat_f > 0, south
    otherwise (EPSG 9829; EPSG:3413 / EPSG:3031 shapes)."""

    def __init__(self, a, f, lat_f, lon0, fe, fn):
        self.a, self.lon0, self.fe, self.fn = a, lon0, fe, fn
        self.e = math.sqrt(2 * f - f * f)
        self.south = lat_f < 0
        pf = np.float64(math.radians(abs(lat_f)))
        e = self.e
        self.ecof = math.sqrt((1 + e) ** (1 + e) * (1 - e) ** (1 - e))
        self.k0 = float(_m(pf, e)) * self.ecof / (2.0 * float(_t(pf, e)))

    def forward(self, lon, lat):
        lam = np.deg2rad(np.asarray(lon, np.float64) - self.lon0)
        phi = np.deg2rad(np.asarray(lat, np.float64))
        if self.south:
            phi = -phi
            lam = -lam
        rho = 2.0 * self.a * self.k0 * _t(phi, self.e) / self.ecof
        x = rho * np.sin(lam)
        y = -rho * np.cos(lam)
        if self.south:
            x, y = -x, -y
        return self.fe + x, self.fn + y

    def inverse(self, x, y):
        dx = np.asarray(x, np.float64) - self.fe
        dy = np.asarray(y, np.float64) - self.fn
        if self.south:
            dx, dy = -dx, -dy
        rho = np.hypot(dx, dy)
        t = rho * self.ecof / (2.0 * self.a * self.k0)
        phi = _phi_from_t(t, self.e)
        lam = np.arctan2(dx, -dy)
        if self.south:
            phi, lam = -phi, -lam
        return np.rad2deg(lam) + self.lon0, np.rad2deg(phi)


class _Sinusoidal:
    """Spherical sinusoidal on the MODIS authalic radius (the SIN grid of
    MOD09/MCD43 etc.; equal-area, pseudocylindrical)."""

    def __init__(self, r=6371007.181, lon0=0.0):
        self.r, self.lon0 = r, lon0

    def forward(self, lon, lat):
        phi = np.deg2rad(np.asarray(lat, np.float64))
        lam = np.deg2rad(np.asarray(lon, np.float64) - self.lon0)
        return self.r * lam * np.cos(phi), self.r * phi

    def inverse(self, x, y):
        phi = np.asarray(y, np.float64) / self.r
        with np.errstate(divide="ignore", invalid="ignore"):
            lam = np.where(
                np.abs(np.cos(phi)) > 1e-12,
                np.asarray(x, np.float64) / (self.r * np.cos(phi)),
                0.0,
            )
        return np.rad2deg(lam) + self.lon0, np.rad2deg(phi)


_PROJECTIONS = {
    # France: RGF93 / Lambert-93 (the national grid)
    "EPSG:2154": _LCC2SP(_A, _GRS80_F, 49.0, 44.0, 46.5, 3.0, 700000.0, 6600000.0),
    # Canada: NAD83 / Statistics Canada Lambert
    "EPSG:3347": _LCC2SP(
        _A, _GRS80_F, 49.0, 77.0, 63.390675, -91.86666666666667, 6200000.0, 3000000.0
    ),
    # USA: NAD83 / Conus Albers
    "EPSG:5070": _Albers2SP(_A, _GRS80_F, 29.5, 45.5, 23.0, -96.0, 0.0, 0.0),
    # WGS84 / NSIDC Sea Ice Polar Stereographic North
    "EPSG:3413": _PolarStereo(_A, _F, 70.0, -45.0, 0.0, 0.0),
    # WGS84 / Antarctic Polar Stereographic
    "EPSG:3031": _PolarStereo(_A, _F, -71.0, 0.0, 0.0, 0.0),
    # WGS84 / IBCAO Polar Stereographic (ogr_geom.py polar goldens)
    "EPSG:3996": _PolarStereo(_A, _F, 75.0, 0.0, 0.0, 0.0),
    # MODIS sinusoidal grid (ESRI:54008-compatible sphere form)
    "ESRI:54008": _Sinusoidal(),
}


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
    if code in _PROJECTIONS:
        return _PROJECTIONS[code].inverse(x, y)
    raise ValueError(f"unsupported CRS {code}")


def _from_4326(code: str, lon: np.ndarray, lat: np.ndarray):
    if code == "EPSG:4326":
        return lon, lat
    if code == "EPSG:3857":
        from gdal_spark.raster.warp import lonlat_to_meters_np

        return lonlat_to_meters_np(lon, lat)
    if _parse_utm(code):
        return utm_forward(lon, lat, code)
    if code in _PROJECTIONS:
        return _PROJECTIONS[code].forward(lon, lat)
    raise ValueError(f"unsupported CRS {code}")


def supported(code: str) -> bool:
    return (
        code in ("EPSG:4326", "EPSG:3857")
        or _parse_utm(code) is not None
        or code in _PROJECTIONS
    )


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


# --------------------------------------------------------------------------
# Arbitrary-ellipsoid transverse mercator + geocentric datum shift
# (the +proj=utm +ellps=... +towgs84=... path GDAL reaches through PROJ;
# gdalmove.py / ogrct.cpp consume it through OGRCoordinateTransformation).
# --------------------------------------------------------------------------

# name -> (a, 1/f): the short PROJ ellipsoid registry subset the
# reference's own tests exercise
ELLIPSOIDS = {
    "WGS84": (6378137.0, 298.257223563),
    "GRS80": (6378137.0, 298.257222101),
    "clrk66": (6378206.4, 294.978698213898),
    "clrk80": (6378249.145, 293.465),
    "intl": (6378388.0, 297.0),
    "bessel": (6377397.155, 299.1528128),
    "krass": (6378245.0, 298.3),
    "WGS72": (6378135.0, 298.26),
}


class Tmerc:
    """Transverse Mercator on an arbitrary ellipsoid (Karney 2011 series,
    same order-n^6 coefficients as the module-level WGS84 fast path)."""

    def __init__(self, a: float, f: float, lon0: float,
                 k0: float = 0.9996, fe: float = 500000.0, fn: float = 0.0):
        n = f / (2.0 - f)
        self.alpha, self.beta, self.delta, abar_fac = _tm_series(n)
        self.abar = a * abar_fac
        self.e2sn = 2.0 * math.sqrt(n) / (1.0 + n)
        self.lon0, self.k0, self.fe, self.fn = lon0, k0, fe, fn

    def forward(self, lon, lat):
        lam = np.deg2rad(np.asarray(lon, np.float64) - self.lon0)
        phi = np.deg2rad(np.asarray(lat, np.float64))
        s = np.sin(phi)
        t = np.sinh(np.arctanh(s) - self.e2sn * np.arctanh(self.e2sn * s))
        xi_p = np.arctan2(t, np.cos(lam))
        eta_p = np.arcsinh(np.sin(lam) / np.hypot(t, np.cos(lam)))
        xi = xi_p.copy()
        eta = eta_p.copy()
        for j, a in enumerate(self.alpha, start=1):
            xi += a * np.sin(2 * j * xi_p) * np.cosh(2 * j * eta_p)
            eta += a * np.cos(2 * j * xi_p) * np.sinh(2 * j * eta_p)
        return self.fe + self.k0 * self.abar * eta, self.fn + self.k0 * self.abar * xi

    def inverse(self, x, y):
        eta = (np.asarray(x, np.float64) - self.fe) / (self.k0 * self.abar)
        xi = (np.asarray(y, np.float64) - self.fn) / (self.k0 * self.abar)
        xi_p = xi.copy()
        eta_p = eta.copy()
        for j, b in enumerate(self.beta, start=1):
            xi_p -= b * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
            eta_p -= b * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
        chi = np.arcsin(np.sin(xi_p) / np.cosh(eta_p))
        phi = chi.copy()
        for j, d in enumerate(self.delta, start=1):
            phi += d * np.sin(2 * j * chi)
        lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
        return np.rad2deg(lam) + self.lon0, np.rad2deg(phi)


def geodetic_to_geocentric(lon, lat, a: float, f: float, h=0.0):
    """lon/lat degrees on (a, f) -> earth-centered XYZ meters."""
    phi = np.deg2rad(np.asarray(lat, np.float64))
    lam = np.deg2rad(np.asarray(lon, np.float64))
    e2 = 2 * f - f * f
    s = np.sin(phi)
    nu = a / np.sqrt(1.0 - e2 * s * s)
    x = (nu + h) * np.cos(phi) * np.cos(lam)
    y = (nu + h) * np.cos(phi) * np.sin(lam)
    z = (nu * (1.0 - e2) + h) * s
    return x, y, z


def geocentric_to_geodetic(x, y, z, a: float, f: float, iters: int = 6):
    """XYZ -> lon/lat degrees on (a, f): Bowring start + Newton refinement."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    z = np.asarray(z, np.float64)
    e2 = 2 * f - f * f
    b = a * (1.0 - f)
    ep2 = e2 / (1.0 - e2)
    p = np.hypot(x, y)
    th = np.arctan2(z * a, p * b)
    phi = np.arctan2(z + ep2 * b * np.sin(th) ** 3, p - e2 * a * np.cos(th) ** 3)
    for _ in range(iters):
        s = np.sin(phi)
        nu = a / np.sqrt(1.0 - e2 * s * s)
        phi = np.arctan2(z + e2 * nu * s, p)
    return np.rad2deg(np.arctan2(y, x)), np.rad2deg(phi)


def helmert(x, y, z, towgs84):
    """Position-vector Helmert: 3-param shift, or 7-param with rotations
    in arc-seconds and scale in ppm (EPSG 9606 / PROJ +towgs84 order)."""
    p = list(towgs84) + [0.0] * (7 - len(towgs84))
    dx, dy, dz, rx, ry, rz, sppm = p
    if rx == ry == rz == sppm == 0.0:
        return x + dx, y + dy, z + dz
    ax = math.radians(rx / 3600.0)
    ay = math.radians(ry / 3600.0)
    az = math.radians(rz / 3600.0)
    m = 1.0 + sppm * 1e-6
    xr = m * (x - az * y + ay * z) + dx
    yr = m * (az * x + y - ax * z) + dy
    zr = m * (-ay * x + ax * y + z) + dz
    return xr, yr, zr


def helmert_inverse(x, y, z, towgs84):
    p = list(towgs84) + [0.0] * (7 - len(towgs84))
    dx, dy, dz, rx, ry, rz, sppm = p
    if rx == ry == rz == sppm == 0.0:
        return x - dx, y - dy, z - dz
    ax = math.radians(rx / 3600.0)
    ay = math.radians(ry / 3600.0)
    az = math.radians(rz / 3600.0)
    m = 1.0 + sppm * 1e-6
    xs = (x - dx) / m
    ys = (y - dy) / m
    zs = (z - dz) / m
    return xs + az * ys - ay * zs, -az * xs + ys + ax * zs, ay * xs - ax * ys + zs


class ProjCRS:
    """A '+proj=...' definition: projection on its own ellipsoid plus an
    optional +towgs84 datum link. to_wgs84 / from_wgs84 run the full
    inverse-project -> geocentric -> Helmert -> geodetic pipeline."""

    def __init__(self, text: str):
        kv = {}
        for tok in text.split():
            tok = tok.lstrip("+")
            if "=" in tok:
                k, v = tok.split("=", 1)
                kv[k] = v
            else:
                kv[tok] = True
        self.kv = kv
        ell = kv.get("ellps", "WGS84")
        if kv.get("datum") == "NAD27":
            ell = "clrk66"
        a_inv = ELLIPSOIDS.get(ell, ELLIPSOIDS["WGS84"])
        self.a = float(kv.get("a", a_inv[0]))
        rf = float(kv.get("rf", a_inv[1]))
        self.f = 1.0 / rf if rf else 0.0
        tw = kv.get("towgs84")
        self.towgs84 = [float(v) for v in tw.split(",")] if tw else None
        # +nadgrids=<name>: a grid registered with
        # functions/datumshift.register_grid; takes precedence over
        # towgs84 (PROJ grid-operation ranking)
        self.nadgrids = kv.get("nadgrids")
        proj = kv.get("proj", "longlat")
        if proj == "utm":
            zone = int(kv["zone"])
            fn = 10000000.0 if "south" in kv else 0.0
            self.proj = Tmerc(self.a, self.f, zone * 6.0 - 183.0, fn=fn)
        elif proj == "tmerc":
            self.proj = Tmerc(
                self.a, self.f, float(kv.get("lon_0", 0.0)),
                k0=float(kv.get("k_0", 1.0)), fe=float(kv.get("x_0", 0.0)),
                fn=float(kv.get("y_0", 0.0)),
            )
        elif proj == "longlat":
            self.proj = None
        else:
            raise ValueError(f"unsupported +proj={proj}")

    def _to_geodetic(self, x, y):
        if self.proj is None:
            return np.asarray(x, np.float64), np.asarray(y, np.float64)
        return self.proj.inverse(x, y)

    def _from_geodetic(self, lon, lat):
        if self.proj is None:
            return lon, lat
        return self.proj.forward(lon, lat)

    def _same_datum(self):
        return (
            (self.towgs84 is None or not any(self.towgs84))
            and abs(self.a - _A) < 1e-9
            and abs(self.f - _F) < 1e-15
        )

    def to_wgs84(self, x, y):
        lon, lat = self._to_geodetic(x, y)
        if self.nadgrids:
            # grid shift (e.g. NAD27->NAD83~=WGS84): the grid IS the
            # datum link, no geocentric leg
            from gdal_spark.functions.datumshift import grid_shift

            return grid_shift(lon, lat, self.nadgrids)
        if self._same_datum():
            return lon, lat
        gx, gy, gz = geodetic_to_geocentric(lon, lat, self.a, self.f)
        if self.towgs84:
            gx, gy, gz = helmert(gx, gy, gz, self.towgs84)
        return geocentric_to_geodetic(gx, gy, gz, _A, _F)

    def from_wgs84(self, lon, lat):
        if self.nadgrids:
            from gdal_spark.functions.datumshift import grid_shift

            lon, lat = grid_shift(lon, lat, self.nadgrids, inverse=True)
        elif not self._same_datum():
            gx, gy, gz = geodetic_to_geocentric(lon, lat, _A, _F)
            if self.towgs84:
                gx, gy, gz = helmert_inverse(gx, gy, gz, self.towgs84)
            lon, lat = geocentric_to_geodetic(gx, gy, gz, self.a, self.f)
        return self._from_geodetic(lon, lat)


def transform_any(src: str, dst: str, x, y):
    """transform() extended to '+proj=...' strings on either side (PROJ
    pipeline role: inverse-project src -> datum shift via WGS84
    geocentric -> project dst)."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    if src.lstrip().startswith("+"):
        lon, lat = ProjCRS(src).to_wgs84(x, y)
    else:
        lon, lat = _to_4326(src, x, y)
    if dst.lstrip().startswith("+"):
        return ProjCRS(dst).from_wgs84(lon, lat)
    return _from_4326(dst, lon, lat)
