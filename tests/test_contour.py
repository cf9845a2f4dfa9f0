"""Contour kernel + distributed operator tests.

Oracles: analytic isolines (plane -> straight line at exact x; radial
field -> closed ring of known circumference), segment-value invariant
(every emitted endpoint interpolates to the level), and tiled == global
segment-set equality (the halo makes per-tile marching squares exact)."""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.raster import contour as C


def _radial(h=48, w=48, cx=24.0, cy=24.0):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    return np.hypot(xx - cx, yy - cy)


class TestMarchingSquares:
    def test_plane_vertical_line(self):
        g = np.tile(np.arange(20, dtype=np.float64), (10, 1))  # z = x
        segs = C.marching_squares(g, 7.25)
        assert segs
        xs = [s[0] for s in segs] + [s[2] for s in segs]
        assert np.allclose(xs, 7.25)
        lines = C.chain_segments(segs)
        assert len(lines) == 1
        assert len(lines[0]) == 10  # spans all 9 cells vertically

    def test_endpoint_value_invariant(self):
        rng = np.random.default_rng(3)
        g = rng.random((16, 18)) * 10
        level = 4.7
        for x0, y0, x1, y1 in C.marching_squares(g, level):
            for x, y in ((x0, y0), (x1, y1)):
                # endpoint lies on a cell edge: one coord integer
                if x == int(x) and y == int(y):
                    continue  # exact node hit (measure zero, skip)
                if y == int(y):  # horizontal edge
                    j = int(np.floor(x))
                    v = g[int(y), j] + (x - j) * (g[int(y), j + 1] - g[int(y), j])
                else:  # vertical edge
                    i = int(np.floor(y))
                    v = g[i, int(x)] + (y - i) * (g[i + 1, int(x)] - g[i, int(x)])
                assert v == pytest.approx(level, abs=1e-9)

    def test_radial_closed_ring(self):
        g = _radial()
        segs = C.marching_squares(g, 10.0)
        lines = C.chain_segments(segs)
        assert len(lines) == 1
        ring = lines[0]
        assert np.allclose(ring[0], ring[-1])
        length = np.sqrt((np.diff(ring, axis=0) ** 2).sum(1)).sum()
        assert length == pytest.approx(2 * np.pi * 10.0, rel=0.02)

    def test_orientation_higher_on_left(self):
        g = np.tile(np.arange(10, dtype=np.float64), (6, 1))  # increases east
        segs = C.marching_squares(g, 4.5)
        # isoline runs along x=4.5; higher values (east) on the left of
        # direction of travel => travel must be from north to south (+y)
        for x0, y0, x1, y1 in segs:
            assert y1 > y0

    def test_tiled_equals_global(self, spark):
        rng = np.random.default_rng(11)
        g = rng.random((40, 56)) * 8
        levels = [2.0, 4.0, 6.0]
        want = {
            lv: {tuple(np.round(s, 9)) for s in C.marching_squares(g, lv)}
            for lv in levels
        }
        tiles = C.halo_tiles_from_array(spark, g, 16)
        out = C.contour(tiles, 16, levels).collect()
        # reconstruct segment sets from stitched lines
        got: dict[float, set] = {lv: set() for lv in levels}
        from gdal_spark.functions import wkb as W

        for r in out:
            _, pts = W.parse(bytes(r.wkb))
            for k in range(len(pts) - 1):
                got[r.level].add(
                    tuple(np.round([pts[k][0], pts[k][1], pts[k + 1][0], pts[k + 1][1]], 9))
                )
        for lv in levels:
            assert got[lv] == want[lv], f"level {lv}"


class TestOperatorOutputs:
    def test_radial_operator(self, spark):
        g = _radial()
        tiles = C.halo_tiles_from_array(spark, g, 16)
        rows = C.contour(tiles, 16, [8.0, 14.0]).collect()
        by_level = {}
        for r in rows:
            by_level.setdefault(r.level, []).append(r)
        for lv, expect_len in ((8.0, 2 * np.pi * 8), (14.0, 2 * np.pi * 14)):
            lines = by_level[lv]
            assert len(lines) == 1 and lines[0].closed
            assert lines[0].length == pytest.approx(expect_len, rel=0.02)


class TestContourPolygons:
    def test_bands_partition_the_raster(self, spark):
        """Every pixel lands in exactly one band polygon; per-band pixel
        counts match a numpy classification."""
        import numpy as np

        from gdal_spark.raster.contour import contour_polygons

        rng = np.random.default_rng(3)
        yy, xx = np.mgrid[0:48, 0:40]
        grid = 50.0 + 30.0 * np.sin(xx / 7.0) * np.cos(yy / 9.0) + rng.uniform(0, 1, (48, 40))
        levels = [30.0, 50.0, 70.0]
        out = contour_polygons(spark, grid, levels, tile=16).collect()
        total = sum(r["npix"] for r in out)
        assert total == grid.size
        want = np.bincount(
            np.searchsorted(np.array(levels), grid, side="right").ravel(), minlength=4
        )
        got = np.zeros(4, dtype=int)
        for r in out:
            got[r["band"]] += r["npix"]
        np.testing.assert_array_equal(got, want)
        # band bounds attached correctly
        for r in out:
            if r["band"] == 0:
                assert r["level_max"] == 30.0
            if r["band"] == 3:
                assert r["level_min"] == 70.0

    def test_single_band_one_polygon(self, spark):
        import numpy as np

        from gdal_spark.functions import wkb as W
        from gdal_spark.raster.contour import contour_polygons

        grid = np.full((20, 30), 5.0)
        out = contour_polygons(spark, grid, [10.0], tile=8).collect()
        assert len(out) == 1
        r = out[0]
        assert r["band"] == 0 and r["npix"] == 600 and r["area"] == 600.0
        rings = W.polygon_rings(bytes(r["wkb"]))[0]
        assert len(rings) == 1  # plain rectangle, no holes
