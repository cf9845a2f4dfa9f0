"""Geodesic length/area (ST_GeodesicLength/Area) + ST_IsSimple/MakeValid.

Length goldens: published WGS84 geodesic distances (Vincenty's own test
line and well-known city pairs).  Area goldens: closed-form ellipsoid
facts (total surface area, lune fractions) that the authalic construction
must reproduce exactly.
"""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.functions import geodesic as GE
from gdal_spark.functions import st_catalog as ST
from gdal_spark.functions import wkb as W


class TestVincenty:
    def test_equator_degree(self):
        # one degree of longitude on the equator = 111319.491 m (a * pi/180)
        d = float(GE.vincenty_m(0.0, 0.0, 1.0, 0.0))
        assert abs(d - 111319.491) < 0.01

    def test_meridian_quarter(self):
        # pole-to-equator meridian arc = 10001965.729 m (WGS84 quadrant)
        d = float(GE.vincenty_m(0.0, 0.0, 0.0, 90.0))
        assert abs(d - 10001965.729) < 0.5

    def test_symmetry_and_zero(self):
        assert float(GE.vincenty_m(12.3, 45.6, 12.3, 45.6)) == 0.0
        d1 = float(GE.vincenty_m(2.35, 48.85, -0.13, 51.5))  # Paris-London
        d2 = float(GE.vincenty_m(-0.13, 51.5, 2.35, 48.85))
        assert abs(d1 - d2) < 1e-6
        assert 330_000 < d1 < 350_000  # ~341 km

    def test_flattening_matters(self):
        # sphere would give 10007543 m for the quadrant; ellipsoid is shorter
        d = float(GE.vincenty_m(0.0, 0.0, 0.0, 90.0))
        assert d < 10007000


class TestAuthalicArea:
    def test_whole_hemisphere_lune(self):
        # a 90-degree lune (quarter hemisphere band 0..90 lon, 0..90 lat)
        # covers 1/8 of the ellipsoid surface. WGS84 authalic radius
        # R = 6371007.1810 m (published); surface = 4 pi R^2.
        R = GE.R_AUTHALIC
        assert abs(R - 6371007.1810) < 0.01
        ring = np.array(
            [[0, 0], [90, 0], [90, 90], [0, 90], [0, 0]], dtype=float
        )
        # triangle-fan through near-pole vertices is exact for great-circle
        # edges; meridian + equator edges ARE great circles here
        area = abs(GE.geodesic_area_ring(ring))
        assert abs(area - 4 * np.pi * R**2 / 8) / (4 * np.pi * R**2 / 8) < 1e-9

    def test_small_square_vs_planar(self):
        # 0.01-deg quad at the equator: width = a*dlam = 1113.19491 m,
        # height = M(0)*dphi = a(1-e^2)*dphi = 1105.74297 m (meridional
        # radius at the equator) — planar product good to ~1e-4 relative
        ring = np.array(
            [[0, 0], [0.01, 0], [0.01, 0.01], [0, 0.01], [0, 0]], dtype=float
        )
        area = abs(GE.geodesic_area_ring(ring))
        w = 6378137.0 * np.radians(0.01)
        h = 6378137.0 * (1 - 0.00669437999014) * np.radians(0.01)
        assert abs(area - w * h) / (w * h) < 1e-3

    def test_hole_subtracts(self):
        outer = np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]], float)
        hole = np.array([[0.2, 0.2], [0.8, 0.2], [0.8, 0.8], [0.2, 0.8], [0.2, 0.2]], float)
        buf = W.write_polygon([outer, hole])
        a = GE.wkb_geodesic_area(buf)
        assert abs(a - (abs(GE.geodesic_area_ring(outer)) - abs(GE.geodesic_area_ring(hole)))) < 1.0


class TestIsSimpleMakeValid:
    def test_simple_polygon(self):
        ring = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], float)
        assert ST._is_simple(W.write_polygon([ring]))

    def test_bowtie_not_simple(self):
        bow = np.array([[0, 0], [4, 4], [4, 0], [0, 4], [0, 0]], float)
        assert not ST._is_simple(W.write_polygon([bow]))

    def test_selfcrossing_linestring(self):
        ls = W.write_linestring(np.array([[0, 0], [4, 4], [4, 0], [0, 4]], float))
        assert not ST._is_simple(ls)
        ls2 = W.write_linestring(np.array([[0, 0], [1, 1], [2, 0]], float))
        assert ST._is_simple(ls2)

    def test_makevalid_bowtie_area(self):
        # bowtie even-odd area = two triangles of 4 each = 8;
        # MakeValid must normalize to a region with that exact area
        from gdal_spark.functions import geom as G

        bow = np.array([[0, 0], [4, 4], [4, 0], [0, 4], [0, 0]], float)
        out = ST._make_valid(W.write_polygon([bow]))
        assert abs(G.wkb_area(bytes(out)) - 8.0) < 1e-6

    def test_makevalid_valid_passthrough_area(self):
        from gdal_spark.functions import geom as G

        ring = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], float)
        out = ST._make_valid(W.write_polygon([ring]))
        assert abs(G.wkb_area(bytes(out)) - 16.0) < 1e-9


@pytest.mark.spark
class TestSqlRegistration:
    def test_new_functions_callable(self):
        from gdal_spark.session import get_session

        spark = get_session(master="local[2]", shuffle_partitions=2)
        ST.register_all(spark)
        row = spark.sql(
            "SELECT ST_IsSimple(ST_GeomFromText('POLYGON((0 0,4 0,4 4,0 4,0 0))')) AS s, "
            "round(ST_GeodesicArea(ST_GeomFromText('POLYGON((0 0,0.01 0,0.01 0.01,0 0.01,0 0))'))) AS a, "
            "round(ST_GeodesicLength(ST_GeomFromText('LINESTRING(0 0,1 0)'))) AS l"
        ).collect()[0]
        assert row.s is True
        assert abs(row.a - 1113.19491**2) / 1113.19491**2 < 1e-2
        assert abs(row.l - 111319.0) < 2
