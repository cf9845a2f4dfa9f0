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
        # southern-hemisphere grids have n < 0 (rho runs negative):
        # mirror both axes before taking the polar angle
        th = np.arctan2(np.sign(self.n) * dx, np.sign(self.n) * dy)
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


class _LCC1SP:
    """Lambert Conic Conformal 1SP (EPSG 9801; Jamaica grids etc.)."""

    def __init__(self, a, f, lat0, lon0, k0, fe, fn):
        self.a, self.lon0, self.fe, self.fn, self.k0 = a, lon0, fe, fn, k0
        self.e = math.sqrt(2 * f - f * f)
        p0 = np.float64(math.radians(lat0))
        m0, t0 = float(_m(p0, self.e)), float(_t(p0, self.e))
        self.n = math.sin(p0)
        self.F = m0 / (self.n * t0 ** self.n)
        self.rho0 = a * self.F * t0 ** self.n * k0

    def forward(self, lon, lat):
        phi = np.deg2rad(np.asarray(lat, np.float64))
        rho = self.a * self.F * _t(phi, self.e) ** self.n * self.k0
        th = self.n * np.deg2rad(np.asarray(lon, np.float64) - self.lon0)
        return self.fe + rho * np.sin(th), self.fn + self.rho0 - rho * np.cos(th)

    def inverse(self, x, y):
        dx = np.asarray(x, np.float64) - self.fe
        dy = self.rho0 - (np.asarray(y, np.float64) - self.fn)
        rho = np.sign(self.n) * np.hypot(dx, dy)
        t = (rho / (self.a * self.F * self.k0)) ** (1.0 / self.n)
        th = np.arctan2(np.sign(self.n) * dx, np.sign(self.n) * dy)
        return np.rad2deg(th / self.n) + self.lon0, np.rad2deg(
            _phi_from_t(t, self.e))


class _Mercator1SP:
    """Mercator variant A/1SP (EPSG 9804; EPSG:3395, Makassar NEIEZ)."""

    def __init__(self, a, f, lon0, k0, fe, fn):
        self.a, self.lon0, self.k0, self.fe, self.fn = a, lon0, k0, fe, fn
        self.e = math.sqrt(2 * f - f * f)

    def forward(self, lon, lat):
        phi = np.deg2rad(np.asarray(lat, np.float64))
        lam = np.deg2rad(np.asarray(lon, np.float64) - self.lon0)
        return (self.fe + self.a * self.k0 * lam,
                self.fn - self.a * self.k0 * np.log(_t(phi, self.e)))

    def inverse(self, x, y):
        t = np.exp(-(np.asarray(y, np.float64) - self.fn) / (self.a * self.k0))
        lam = (np.asarray(x, np.float64) - self.fe) / (self.a * self.k0)
        return np.rad2deg(lam) + self.lon0, np.rad2deg(_phi_from_t(t, self.e))


class _LAEA:
    """Lambert Azimuthal Equal Area, oblique ellipsoidal (EPSG 9820;
    EPSG:3035 ETRS89 / LAEA Europe)."""

    def __init__(self, a, f, lat0, lon0, fe, fn):
        self.a, self.lon0, self.fe, self.fn = a, lon0, fe, fn
        e2 = 2 * f - f * f
        self.e = math.sqrt(e2)
        self.e2 = e2

        def q(phi):
            s = np.sin(phi)
            return (1.0 - e2) * (
                s / (1.0 - e2 * s * s)
                - (1.0 / (2.0 * self.e))
                * np.log((1.0 - self.e * s) / (1.0 + self.e * s)))

        self.q = q
        p0 = np.float64(math.radians(lat0))
        self.qp = float(q(np.float64(math.pi / 2)))
        q0 = float(q(p0))
        self.beta0 = math.asin(q0 / self.qp)
        self.Rq = a * math.sqrt(self.qp / 2.0)
        m0 = float(_m(p0, self.e))
        self.D = a * m0 / (self.Rq * math.cos(self.beta0))

    def forward(self, lon, lat):
        phi = np.deg2rad(np.asarray(lat, np.float64))
        lam = np.deg2rad(np.asarray(lon, np.float64) - self.lon0)
        beta = np.arcsin(np.clip(self.q(phi) / self.qp, -1.0, 1.0))
        sb0, cb0 = math.sin(self.beta0), math.cos(self.beta0)
        B = self.Rq * np.sqrt(
            2.0 / (1.0 + sb0 * np.sin(beta)
                   + cb0 * np.cos(beta) * np.cos(lam)))
        E = self.fe + B * self.D * np.cos(beta) * np.sin(lam)
        N = self.fn + (B / self.D) * (cb0 * np.sin(beta)
                                      - sb0 * np.cos(beta) * np.cos(lam))
        return E, N

    def inverse(self, x, y):
        sb0, cb0 = math.sin(self.beta0), math.cos(self.beta0)
        xp = (np.asarray(x, np.float64) - self.fe) / self.D
        yp = (np.asarray(y, np.float64) - self.fn) * self.D
        rho = np.hypot(xp, yp)
        C = 2.0 * np.arcsin(np.clip(rho / (2.0 * self.Rq), -1.0, 1.0))
        with np.errstate(divide="ignore", invalid="ignore"):
            qv = np.where(
                rho > 1e-12,
                self.qp * (np.cos(C) * sb0 + yp * np.sin(C) * cb0
                           / np.where(rho > 1e-12, rho, 1.0)),
                self.qp * sb0)
            lam = np.arctan2(
                xp * np.sin(C),
                rho * cb0 * np.cos(C) - yp * sb0 * np.sin(C))
            lam = np.where(rho > 1e-12, lam, 0.0)
        phi = np.arcsin(np.clip(qv / 2.0, -1.0, 1.0))
        for _ in range(12):
            s = np.sin(phi)
            phi = phi + (1.0 - self.e2 * s * s) ** 2 / (2.0 * np.cos(phi)) * (
                qv / (1.0 - self.e2)
                - s / (1.0 - self.e2 * s * s)
                + (1.0 / (2.0 * self.e))
                * np.log((1.0 - self.e * s) / (1.0 + self.e * s)))
        return np.rad2deg(lam) + self.lon0, np.rad2deg(phi)


class _SOMerc:
    """Swiss Oblique Mercator (EPSG 9815 circular variant / PROJ somerc;
    CH1903 LV03 EPSG:21781, CH1903+ LV95 EPSG:2056): ellipsoid -> sphere
    double projection, then oblique equatorial Mercator."""

    def __init__(self, a, f, lat0, lon0, k0, fe, fn):
        self.lon0, self.fe, self.fn = lon0, fe, fn
        e2 = 2 * f - f * f
        self.e = math.sqrt(e2)
        p0 = math.radians(lat0)
        c2, s0 = math.cos(p0) ** 2, math.sin(p0)
        self.alpha = math.sqrt(1.0 + e2 * c2 * c2 / (1.0 - e2))
        self.R = k0 * a * math.sqrt(1.0 - e2) / (1.0 - e2 * s0 * s0)
        self.b0 = math.asin(s0 / self.alpha)
        self.K = (math.log(math.tan(math.pi / 4 + self.b0 / 2))
                  - self.alpha * math.log(math.tan(math.pi / 4 + p0 / 2))
                  + self.alpha * self.e / 2
                  * math.log((1 + self.e * s0) / (1 - self.e * s0)))

    def forward(self, lon, lat):
        phi = np.deg2rad(np.asarray(lat, np.float64))
        s = np.sin(phi)
        S = (self.alpha * np.log(np.tan(math.pi / 4 + phi / 2))
             - self.alpha * self.e / 2
             * np.log((1 + self.e * s) / (1 - self.e * s)) + self.K)
        b = 2.0 * (np.arctan(np.exp(S)) - math.pi / 4)
        lam = self.alpha * np.deg2rad(np.asarray(lon, np.float64) - self.lon0)
        sb0, cb0 = math.sin(self.b0), math.cos(self.b0)
        bbar = np.arcsin(cb0 * np.sin(b) - sb0 * np.cos(b) * np.cos(lam))
        lbar = np.arctan2(np.cos(b) * np.sin(lam),
                          cb0 * np.cos(b) * np.cos(lam) + sb0 * np.sin(b))
        return (self.fe + self.R * lbar,
                self.fn + self.R * np.arctanh(np.sin(bbar)))

    def inverse(self, x, y):
        lbar = (np.asarray(x, np.float64) - self.fe) / self.R
        bbar = 2.0 * (np.arctan(
            np.exp((np.asarray(y, np.float64) - self.fn) / self.R))
            - math.pi / 4)
        sb0, cb0 = math.sin(self.b0), math.cos(self.b0)
        b = np.arcsin(cb0 * np.sin(bbar) + sb0 * np.cos(bbar) * np.cos(lbar))
        lam = np.arctan2(np.sin(lbar) * np.cos(bbar),
                         cb0 * np.cos(bbar) * np.cos(lbar)
                         - sb0 * np.sin(bbar))
        lon = np.rad2deg(lam / self.alpha) + self.lon0
        S = np.log(np.tan(math.pi / 4 + b / 2))
        phi = b.copy()
        for _ in range(10):
            s = np.sin(phi)
            phi = 2.0 * np.arctan(np.exp(
                (S - self.K) / self.alpha
                + self.e / 2 * np.log((1 + self.e * s) / (1 - self.e * s))
            )) - math.pi / 2
        return lon, np.rad2deg(phi)


class _Krovak:
    """Krovak oblique conformal conic (EPSG 9819; S-JTSK).  Produces the
    East-North variant's negative coordinates (EPSG:5514: easting =
    -westing, northing = -southing), matching PROJ's +proj=krovak."""

    LAT_PSEUDO = 78.5  # latitude of pseudo standard parallel (fixed)

    def __init__(self, a, f, lat0, lon0, alpha_c, k0, fe, fn):
        self.lon0, self.fe, self.fn = lon0, fe, fn
        e2 = 2 * f - f * f
        self.e = math.sqrt(e2)
        pC = math.radians(lat0)
        sC = math.sin(pC)
        self.A = a * math.sqrt(1 - e2) / (1 - e2 * sC * sC)
        self.B = math.sqrt(1 + e2 * math.cos(pC) ** 4 / (1 - e2))
        self.g0 = math.asin(sC / self.B)
        self.t0 = (math.tan(math.pi / 4 + self.g0 / 2)
                   * ((1 + self.e * sC) / (1 - self.e * sC))
                   ** (self.e * self.B / 2)
                   / math.tan(math.pi / 4 + pC / 2) ** self.B)
        self.alphac = math.radians(alpha_c)
        pP = math.radians(self.LAT_PSEUDO)
        self.n = math.sin(pP)
        self.r0 = k0 * self.A / math.tan(pP)
        self.tanP = math.tan(pP / 2 + math.pi / 4)

    def _u(self, phi):
        s = self.e * np.sin(phi)
        return 2.0 * (np.arctan(
            self.t0 * np.tan(phi / 2 + math.pi / 4) ** self.B
            / ((1 + s) / (1 - s)) ** (self.e * self.B / 2)) - math.pi / 4)

    def forward(self, lon, lat):
        phi = np.deg2rad(np.asarray(lat, np.float64))
        U = self._u(phi)
        V = self.B * np.deg2rad(self.lon0 - np.asarray(lon, np.float64))
        ca, sa = math.cos(self.alphac), math.sin(self.alphac)
        T = np.arcsin(ca * np.sin(U) + sa * np.cos(U) * np.cos(V))
        D = np.arcsin(np.clip(np.cos(U) * np.sin(V) / np.cos(T), -1, 1))
        theta = self.n * D
        r = (self.r0 * self.tanP ** self.n
             / np.tan(T / 2 + math.pi / 4) ** self.n)
        southing = r * np.cos(theta)
        westing = r * np.sin(theta)
        return self.fe - westing, self.fn - southing

    def inverse(self, x, y):
        westing = self.fe - np.asarray(x, np.float64)
        southing = self.fn - np.asarray(y, np.float64)
        r = np.hypot(westing, southing)
        theta = np.arctan2(westing, southing)
        D = theta / self.n
        T = 2.0 * (np.arctan((self.r0 / r) ** (1.0 / self.n)
                             * self.tanP) - math.pi / 4)
        ca, sa = math.cos(self.alphac), math.sin(self.alphac)
        U = np.arcsin(ca * np.sin(T) - sa * np.cos(T) * np.cos(D))
        V = np.arcsin(np.clip(np.cos(T) * np.sin(D) / np.cos(U), -1, 1))
        lon = self.lon0 - np.rad2deg(V / self.B)
        # invert U -> phi (conformal-sphere to ellipsoid latitude)
        phi = U.copy()
        for _ in range(12):
            s = self.e * np.sin(phi)
            phi = 2.0 * (np.arctan(
                self.t0 ** (-1.0 / self.B)
                * np.tan(U / 2 + math.pi / 4) ** (1.0 / self.B)
                * ((1 + s) / (1 - s)) ** (self.e / 2)) - math.pi / 4)
        return lon, np.rad2deg(phi)


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
    if code in EPSG_REGISTRY:
        return _registry_crs(code).to_wgs84(x, y)
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
    if code in EPSG_REGISTRY:
        return _registry_crs(code).from_wgs84(lon, lat)
    raise ValueError(f"unsupported CRS {code}")


def supported(code: str) -> bool:
    return (
        code in ("EPSG:4326", "EPSG:3857")
        or _parse_utm(code) is not None
        or code in _PROJECTIONS
        or code in EPSG_REGISTRY
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
    "airy": (6377563.396, 299.3249646),
    "aust_SA": (6378160.0, 298.25),
}

# PROJ +units= values -> meters per unit
_UNIT_TO_METER = {
    "m": 1.0,
    "us-ft": 1200.0 / 3937.0,
    "ft": 0.3048,
    "link": 0.201168,
}


class Tmerc:
    """Transverse Mercator on an arbitrary ellipsoid (Karney 2011 series,
    same order-n^6 coefficients as the module-level WGS84 fast path)."""

    def __init__(self, a: float, f: float, lon0: float,
                 k0: float = 0.9996, fe: float = 500000.0, fn: float = 0.0,
                 lat0: float = 0.0):
        n = f / (2.0 - f)
        self.alpha, self.beta, self.delta, abar_fac = _tm_series(n)
        self.abar = a * abar_fac
        self.e2sn = 2.0 * math.sqrt(n) / (1.0 + n)
        self.lon0, self.k0, self.fe, self.fn = lon0, k0, fe, fn
        if lat0:
            # natural-origin latitude: subtract the meridian arc to lat0
            # (EPSG 9807 M0 term), computed with the same series
            p0 = math.radians(lat0)
            s0 = math.sin(p0)
            t0 = math.sinh(math.atanh(s0)
                           - self.e2sn * math.atanh(self.e2sn * s0))
            xi0 = math.atan(t0)
            xi = xi0 + sum(av * math.sin(2 * j * xi0)
                           for j, av in enumerate(self.alpha, start=1))
            self.fn = fn - self.k0 * self.abar * xi

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
        units = kv.get("units", "m")
        self.to_meter = float(kv.get("to_meter", _UNIT_TO_METER.get(units)))
        proj = kv.get("proj", "longlat")
        g = lambda k, d=0.0: float(kv.get(k, d))  # noqa: E731
        if proj == "utm":
            zone = int(kv["zone"])
            fn = 10000000.0 if "south" in kv else 0.0
            self.proj = Tmerc(self.a, self.f, zone * 6.0 - 183.0, fn=fn)
        elif proj == "tmerc":
            self.proj = Tmerc(
                self.a, self.f, g("lon_0"), k0=g("k_0", g("k", 1.0)),
                fe=g("x_0"), fn=g("y_0"), lat0=g("lat_0"),
            )
        elif proj == "lcc":
            if "lat_2" in kv:
                self.proj = _LCC2SP(self.a, self.f, g("lat_1"), g("lat_2"),
                                    g("lat_0"), g("lon_0"), g("x_0"),
                                    g("y_0"))
            else:
                self.proj = _LCC1SP(self.a, self.f, g("lat_1", g("lat_0")),
                                    g("lon_0"), g("k_0", g("k", 1.0)),
                                    g("x_0"), g("y_0"))
        elif proj == "aea":
            self.proj = _Albers2SP(self.a, self.f, g("lat_1"), g("lat_2"),
                                   g("lat_0"), g("lon_0"), g("x_0"), g("y_0"))
        elif proj == "laea":
            self.proj = _LAEA(self.a, self.f, g("lat_0"), g("lon_0"),
                              g("x_0"), g("y_0"))
        elif proj == "merc":
            self.proj = _Mercator1SP(self.a, self.f, g("lon_0"),
                                     g("k_0", g("k", 1.0)), g("x_0"),
                                     g("y_0"))
        elif proj == "somerc":
            self.proj = _SOMerc(self.a, self.f, g("lat_0"), g("lon_0"),
                                g("k_0", g("k", 1.0)), g("x_0"), g("y_0"))
        elif proj == "krovak":
            self.proj = _Krovak(self.a, self.f, g("lat_0", 49.5),
                                g("lon_0", 24.833333333333332),
                                g("alpha", 30.28813972222222),
                                g("k", g("k_0", 0.9999)), g("x_0"), g("y_0"))
        elif proj == "stere" and abs(g("lat_0")) == 90.0:
            self.proj = _PolarStereo(self.a, self.f, g("lat_ts", g("lat_0")),
                                     g("lon_0"), g("x_0"), g("y_0"))
        elif proj == "sinu":
            self.proj = _Sinusoidal(r=self.a, lon0=g("lon_0"))
        elif proj == "longlat":
            self.proj = None
        else:
            raise ValueError(f"unsupported +proj={proj}")

    def _to_geodetic(self, x, y):
        if self.proj is None:
            return np.asarray(x, np.float64), np.asarray(y, np.float64)
        if self.to_meter != 1.0:
            x = np.asarray(x, np.float64) * self.to_meter
            y = np.asarray(y, np.float64) * self.to_meter
        return self.proj.inverse(x, y)

    def _from_geodetic(self, lon, lat):
        if self.proj is None:
            return lon, lat
        x, y = self.proj.forward(lon, lat)
        if self.to_meter != 1.0:
            return x / self.to_meter, y / self.to_meter
        return x, y

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


# --------------------------------------------------------------------------
# Parameterized EPSG registry: code -> PROJ-string definition.  The
# parameter values are the public EPSG registry data (EPSG Guidance Note
# 7-2 worked-example CRSs and the most-used national grids); the
# reference resolves ANY code through proj.db
# (ogr/ogrspatialreference.cpp importFromEPSG, ogr/ogrct.cpp) — this
# table covers the codes a corpus pipeline is likely to meet, and
# register_epsg() lets a job add its own without touching the engine.
# --------------------------------------------------------------------------

EPSG_REGISTRY: dict[str, str] = {
    # Great Britain: OSGB36 / British National Grid (TM on Airy 1830)
    "EPSG:27700": "+proj=tmerc +lat_0=49 +lon_0=-2 +k_0=0.9996012717 "
                  "+x_0=400000 +y_0=-100000 +ellps=airy "
                  "+towgs84=446.448,-125.157,542.06,0.15,0.247,0.842,-20.489",
    # Europe: ETRS89 / UTM zones 32N, 33N
    "EPSG:25832": "+proj=utm +zone=32 +ellps=GRS80",
    "EPSG:25833": "+proj=utm +zone=33 +ellps=GRS80",
    # Spain/ED50 UTM 30N with 3-param shift
    "EPSG:23030": "+proj=utm +zone=30 +ellps=intl +towgs84=-87,-98,-121",
    # New Zealand: NZGD2000 / NZTM2000
    "EPSG:2193": "+proj=tmerc +lat_0=0 +lon_0=173 +k_0=0.9996 "
                 "+x_0=1600000 +y_0=10000000 +ellps=GRS80",
    # Australia: GDA94 / MGA zone 55, GDA94 Australian Albers
    "EPSG:28355": "+proj=utm +zone=55 +south +ellps=GRS80",
    "EPSG:3577": "+proj=aea +lat_1=-18 +lat_2=-36 +lat_0=0 +lon_0=132 "
                 "+ellps=GRS80",
    # North America: NAD83 UTM 17N
    "EPSG:26917": "+proj=utm +zone=17 +ellps=GRS80",
    # Europe: ETRS89-extended / LAEA Europe (the INSPIRE grid)
    "EPSG:3035": "+proj=laea +lat_0=52 +lon_0=10 +x_0=4321000 "
                 "+y_0=3210000 +ellps=GRS80",
    # World Mercator + the GN7-2 Mercator worked example (Makassar NEIEZ)
    "EPSG:3395": "+proj=merc +lon_0=0 +k_0=1 +ellps=WGS84",
    "EPSG:3002": "+proj=merc +lon_0=110 +k_0=0.997 +x_0=3900000 "
                 "+y_0=900000 +ellps=bessel +towgs84=-587.8,519.75,145.76",
    # Switzerland: CH1903 / LV03 and CH1903+ / LV95 (Swiss Oblique
    # Mercator on Bessel)
    "EPSG:21781": "+proj=somerc +lat_0=46.952405555555565 "
                  "+lon_0=7.439583333333333 +k_0=1 +x_0=600000 "
                  "+y_0=200000 +ellps=bessel "
                  "+towgs84=674.374,15.056,405.346",
    "EPSG:2056": "+proj=somerc +lat_0=46.952405555555565 "
                 "+lon_0=7.439583333333333 +k_0=1 +x_0=2600000 "
                 "+y_0=1200000 +ellps=bessel +towgs84=674.374,15.056,405.346",
    # Czechia/Slovakia: S-JTSK / Krovak East North
    "EPSG:5514": "+proj=krovak +lat_0=49.5 +lon_0=24.833333333333332 "
                 "+alpha=30.28813972222222 +k=0.9999 +x_0=0 +y_0=0 "
                 "+ellps=bessel +towgs84=589,76,480",
    # USA: NAD27 / Texas South Central (LCC-2SP in US survey feet — the
    # GN7-2 §3.1.1.1 worked example)
    "EPSG:32040": "+proj=lcc +lat_1=28.383333333333333 "
                  "+lat_2=30.283333333333333 +lat_0=27.833333333333332 "
                  "+lon_0=-99 +x_0=609601.2192024384 +y_0=0 +ellps=clrk66 "
                  "+units=us-ft",
    # Jamaica 1969 / National Grid (LCC-1SP — the GN7-2 §3.1.1.2 example)
    "EPSG:24200": "+proj=lcc +lat_1=18 +lat_0=18 +lon_0=-77 +k_0=1 "
                  "+x_0=250000 +y_0=150000 +ellps=clrk66",
    # Australian Antarctic Polar Stereographic (GN7-2 variant-B example)
    "EPSG:3032": "+proj=stere +lat_0=-90 +lat_ts=-71 +lon_0=70 "
                 "+x_0=6000000 +y_0=6000000 +ellps=WGS84",
    # Belgium: BD72 / Belgian Lambert 72 (LCC-2SP, 7-param shift)
    "EPSG:31370": "+proj=lcc +lat_1=51.16666723333333 +lat_2=49.8333339 "
                  "+lat_0=90 +lon_0=4.367486666666666 +x_0=150000.013 "
                  "+y_0=5400088.438 +ellps=intl "
                  "+towgs84=-106.869,52.2978,-103.724,0.3366,-0.457,"
                  "1.8422,-1.2747",
    # Europe (geographic): ETRS89 / NAD83 — zero shift vs WGS84 at the
    # engine's accuracy model
    "EPSG:4258": "+proj=longlat +ellps=GRS80",
    "EPSG:4269": "+proj=longlat +ellps=GRS80",
    # ESRI continental Albers grids
    "ESRI:102003": "+proj=aea +lat_1=29.5 +lat_2=45.5 +lat_0=37.5 "
                   "+lon_0=-96 +ellps=GRS80",
    "ESRI:102008": "+proj=aea +lat_1=20 +lat_2=60 +lat_0=40 +lon_0=-96 "
                   "+ellps=GRS80",
}

_REGISTRY_CACHE: dict[str, "ProjCRS"] = {}


def register_epsg(code: str, proj_string: str) -> None:
    """Register (or override) a CRS definition for generic dispatch."""
    EPSG_REGISTRY[code] = proj_string
    _REGISTRY_CACHE.pop(code, None)


def _registry_crs(code: str) -> "ProjCRS":
    crs = _REGISTRY_CACHE.get(code)
    if crs is None:
        crs = _REGISTRY_CACHE[code] = ProjCRS(EPSG_REGISTRY[code])
    return crs


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
