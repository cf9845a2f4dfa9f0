"""Conic/azimuthal/sinusoidal projections (functions/crs.py additions).

Oracles are the projections' defining mathematical properties, evaluated
numerically — independent of any library:
 * grid-origin anchors: forward(lon0, lat0) == (FE, FN);
 * machine-precision round-trips across the CRS's domain;
 * unit scale on the standard parallels (LCC / polar stereographic);
 * conformality (meridian scale == parallel scale) for conformal
   projections; unit area scale for equal-area ones (Albers, sinusoidal).
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from gdal_spark.functions import crs

A = crs._A
E2_GRS80 = 2 * crs._GRS80_F - crs._GRS80_F ** 2
E2_WGS84 = 2 * crs._F - crs._F ** 2


def _scales(code, lon, lat, e2):
    """Numerical meridian/parallel scale factors at (lon, lat)."""
    d = 1e-7
    x0, y0 = crs.transform("EPSG:4326", code, np.array([lon]), np.array([lat]))
    xm, ym = crs.transform("EPSG:4326", code, np.array([lon]), np.array([lat + d]))
    xp, yp = crs.transform("EPSG:4326", code, np.array([lon + d]), np.array([lat]))
    phi = math.radians(lat)
    s2 = math.sin(phi) ** 2
    M = A * (1 - e2) / (1 - e2 * s2) ** 1.5  # meridional curvature radius
    N = A / math.sqrt(1 - e2 * s2)  # prime vertical radius
    dphi = math.radians(d)
    dlam = math.radians(d)
    k_m = math.hypot(xm[0] - x0[0], ym[0] - y0[0]) / (M * dphi)
    k_p = math.hypot(xp[0] - x0[0], yp[0] - y0[0]) / (N * math.cos(phi) * dlam)
    return k_m, k_p


CASES = [
    # code, (lon0, lat0, FE, FN), (lat1, lat2), e2, domain (lon lo/hi, lat lo/hi)
    ("EPSG:2154", (3.0, 46.5, 700000.0, 6600000.0), (49.0, 44.0), E2_GRS80, (-4, 9, 41, 51)),
    ("EPSG:3347", (-91.8666666666667, 63.390675, 6200000.0, 3000000.0), (49.0, 77.0),
     E2_GRS80, (-140, -50, 42, 83)),
    ("EPSG:5070", (-96.0, 23.0, 0.0, 0.0), (29.5, 45.5), E2_GRS80, (-125, -66, 24, 50)),
]


@pytest.mark.parametrize("code,origin,parallels,e2,dom", CASES)
def test_grid_origin_anchor(code, origin, parallels, e2, dom):
    lon0, lat0, fe, fn = origin
    x, y = crs.transform("EPSG:4326", code, np.array([lon0]), np.array([lat0]))
    assert x[0] == pytest.approx(fe, abs=1e-6)
    assert y[0] == pytest.approx(fn, abs=1e-6)


@pytest.mark.parametrize("code,origin,parallels,e2,dom", CASES)
def test_roundtrip(code, origin, parallels, e2, dom):
    rng = np.random.default_rng(3)
    lon = rng.uniform(dom[0], dom[1], 200)
    lat = rng.uniform(dom[2], dom[3], 200)
    x, y = crs.transform("EPSG:4326", code, lon, lat)
    lon2, lat2 = crs.transform(code, "EPSG:4326", x, y)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)


@pytest.mark.parametrize("code,origin,parallels,e2,dom", CASES)
def test_unit_scale_or_area_on_standard_parallels(code, origin, parallels, e2, dom):
    lon0 = origin[0]
    for lat_sp in parallels:
        k_m, k_p = _scales(code, lon0 + 5.0, lat_sp, e2)
        if code == "EPSG:5070":  # Albers: equal-area everywhere
            assert k_m * k_p == pytest.approx(1.0, abs=1e-6)
            assert k_p == pytest.approx(1.0, abs=1e-6)  # and k=1 on the SPs
        else:  # LCC: conformal, k=1 on the SPs
            assert k_m == pytest.approx(k_p, abs=1e-6)
            assert k_p == pytest.approx(1.0, abs=1e-6)


def test_lcc_conformal_off_parallels():
    k_m, k_p = _scales("EPSG:2154", 5.0, 47.3, E2_GRS80)
    assert k_m == pytest.approx(k_p, rel=1e-6)
    assert k_p != pytest.approx(1.0, abs=1e-4)  # but not unit scale


def test_albers_equal_area_everywhere():
    for lon, lat in [(-120.0, 35.0), (-80.0, 42.0), (-100.0, 27.0)]:
        k_m, k_p = _scales("EPSG:5070", lon, lat, E2_GRS80)
        assert k_m * k_p == pytest.approx(1.0, abs=1e-6)


class TestPolarStereo:
    def test_pole_anchor_and_axes(self):
        # north pole -> (0,0); along lon0 (-45E) the y-axis points south
        x, y = crs.transform("EPSG:4326", "EPSG:3413", np.array([-45.0]), np.array([90.0]))
        assert abs(x[0]) < 1e-6 and abs(y[0]) < 1e-6
        x, y = crs.transform("EPSG:4326", "EPSG:3413", np.array([-45.0]), np.array([70.0]))
        assert x[0] == pytest.approx(0.0, abs=1e-6) and y[0] < 0

    def test_south_aspect_anchor(self):
        x, y = crs.transform("EPSG:4326", "EPSG:3031", np.array([0.0]), np.array([-90.0]))
        assert abs(x[0]) < 1e-6 and abs(y[0]) < 1e-6
        # along lon0 = 0 heading away from the south pole, y grows positive
        x, y = crs.transform("EPSG:4326", "EPSG:3031", np.array([0.0]), np.array([-71.0]))
        assert x[0] == pytest.approx(0.0, abs=1e-6) and y[0] > 0

    def test_unit_scale_on_standard_parallel_and_conformal(self):
        k_m, k_p = _scales("EPSG:3413", 10.0, 70.0, E2_WGS84)
        assert k_m == pytest.approx(k_p, rel=1e-6)
        assert k_p == pytest.approx(1.0, abs=1e-6)
        k_m, k_p = _scales("EPSG:3031", 45.0, -71.0, E2_WGS84)
        assert k_m == pytest.approx(k_p, rel=1e-6)
        assert k_p == pytest.approx(1.0, abs=1e-6)

    @pytest.mark.parametrize("code,latr", [("EPSG:3413", (55, 89.5)), ("EPSG:3031", (-89.5, -55))])
    def test_roundtrip(self, code, latr):
        rng = np.random.default_rng(5)
        lon = rng.uniform(-180, 180, 200)
        lat = rng.uniform(latr[0], latr[1], 200)
        x, y = crs.transform("EPSG:4326", code, lon, lat)
        lon2, lat2 = crs.transform(code, "EPSG:4326", x, y)
        # wrap lon difference
        dl = (lon2 - lon + 180.0) % 360.0 - 180.0
        np.testing.assert_allclose(dl, 0.0, atol=1e-9)
        np.testing.assert_allclose(lat2, lat, atol=1e-9)


class TestSinusoidal:
    def test_axis_anchors(self):
        r = 6371007.181
        x, y = crs.transform("EPSG:4326", "ESRI:54008", np.array([0.0, 90.0]), np.array([30.0, 0.0]))
        assert x[0] == pytest.approx(0.0, abs=1e-9)
        assert y[1] == pytest.approx(0.0, abs=1e-9)
        assert x[1] == pytest.approx(r * math.pi / 2.0, rel=1e-12)  # equator is true scale
        assert y[0] == pytest.approx(r * math.radians(30.0), rel=1e-12)  # meridian arc Rφ

    def test_equal_area_spherical(self):
        # spherical area element: dA = R^2 cosφ dλ dφ; jacobian of (x,y)
        # must equal that, i.e. |∂x/∂λ * ∂y/∂φ| = R^2 cosφ
        r = 6371007.181
        d = 1e-7
        for lon, lat in [(10.0, 40.0), (-60.0, -20.0), (100.0, 70.0)]:
            x0, y0 = crs.transform("EPSG:4326", "ESRI:54008", np.array([lon]), np.array([lat]))
            xp, _ = crs.transform("EPSG:4326", "ESRI:54008", np.array([lon + d]), np.array([lat]))
            _, ym = crs.transform("EPSG:4326", "ESRI:54008", np.array([lon]), np.array([lat + d]))
            jac = abs((xp[0] - x0[0]) / math.radians(d) * (ym[0] - y0[0]) / math.radians(d))
            assert jac == pytest.approx(r * r * math.cos(math.radians(lat)), rel=1e-5)

    def test_roundtrip(self):
        rng = np.random.default_rng(9)
        lon = rng.uniform(-179, 179, 200)
        lat = rng.uniform(-85, 85, 200)
        x, y = crs.transform("EPSG:4326", "ESRI:54008", lon, lat)
        lon2, lat2 = crs.transform("ESRI:54008", "EPSG:4326", x, y)
        np.testing.assert_allclose(lon2, lon, atol=1e-9)
        np.testing.assert_allclose(lat2, lat, atol=1e-9)


def test_cross_family_hub_composition():
    """Lambert-93 -> UTM31 through the hub == chaining the two halves."""
    lon = np.array([2.35, 5.4])
    lat = np.array([48.85, 43.3])
    x93, y93 = crs.transform("EPSG:4326", "EPSG:2154", lon, lat)
    e1, n1 = crs.transform("EPSG:2154", "EPSG:32631", x93, y93)
    e2, n2 = crs.utm_forward(lon, lat, "EPSG:32631")
    np.testing.assert_allclose(e1, e2, atol=1e-6)
    np.testing.assert_allclose(n1, n2, atol=1e-6)


def test_warp_supports_new_crs():
    from gdal_spark.raster import warp as WP

    inv = WP.get_inverse_transform("EPSG:4326", "EPSG:2154")
    lon, lat = inv(np.array([700000.0]), np.array([6600000.0]))
    assert lon[0] == pytest.approx(3.0, abs=1e-9)
    assert lat[0] == pytest.approx(46.5, abs=1e-9)


def test_polar_stereo_3996_ogr_geom_goldens():
    """autotest/ogr/ogr_geom.py transform_polar_projected_to_geographic:
    EPSG:3996 ring vertices at rho 100000 / 50000 land on the pinned
    latitudes; quadrant longitudes follow atan2(E, -N)."""
    from gdal_spark.functions.crs import _PROJECTIONS as PROJECTIONS

    p = PROJECTIONS["EPSG:3996"]
    lon, lat = p.inverse(0.0, 100000.0)
    assert abs(lon - 180.0) < 1e-9 and abs(lat - 89.0892008251069) < 1e-9
    lon, lat = p.inverse(0.0, 50000.0)
    assert abs(lon - 180.0) < 1e-9 and abs(lat - 89.5445935108883) < 1e-9
    lon, lat = p.inverse(100000.0, 0.0)
    assert abs(lon - 90.0) < 1e-12 and abs(lat - 89.089200825091) < 1e-9
    lon, lat = p.inverse(-100000.0, 0.0)
    assert abs(lon + 90.0) < 1e-12
    lon, lat = p.inverse(0.0, -100000.0)
    assert abs(lon) < 1e-12
    # corner of the second polygon: (100000, 100000) -> 45 deg, 88.7119...
    lon, lat = p.inverse(100000.0, 100000.0)
    assert abs(lon - 135.0) < 1e-9 and abs(lat - 88.7119614804959) < 1e-9
    # round trip
    e, n = p.forward(135.0, 88.7119614804959)
    assert abs(e - 100000.0) < 1e-4 and abs(n - 100000.0) < 1e-4
