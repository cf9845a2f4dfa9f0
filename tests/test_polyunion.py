"""Slab-sweep union kernel vs brute-force pixel-coverage oracle."""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.functions import polyclip as PC
from gdal_spark.functions import polyunion as PU


def box(x0, y0, x1, y1):
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], float)


def tri(x0, y0, x1, y1, x2, y2):
    return np.array([[x0, y0], [x1, y1], [x2, y2], [x0, y0]], float)


def coverage_area(ring_sets, lo=-2.0, hi=22.0, n=600):
    """Monte-Carlo-free oracle: dense-grid even-odd coverage of the union."""
    from gdal_spark.functions import geom

    xs = np.linspace(lo, hi, n) + 0.5 * (hi - lo) / n
    yy, xx = np.meshgrid(xs, xs, indexing="ij")
    px, py = xx.ravel(), yy.ravel()
    covered = np.zeros(px.shape, dtype=bool)
    for rings in ring_sets:
        inside = geom.points_in_ring(px, py, rings[0])
        for hole in rings[1:]:
            inside &= ~geom.points_in_ring(px, py, hole)
        covered |= inside
    cell = ((hi - lo) / n) ** 2
    return covered.sum() * cell


class TestUnionExact:
    def test_disjoint(self):
        reg = PU.union_region([[box(0, 0, 2, 2)], [box(5, 5, 6, 7)]])
        assert len(reg) == 2
        assert PC.region_area(reg) == pytest.approx(4.0 + 2.0)

    def test_shared_edge_boxes(self):
        reg = PU.union_region([[box(0, 0, 2, 2)], [box(2, 0, 4, 2)]])
        assert len(reg) == 1
        assert PC.region_area(reg) == pytest.approx(8.0)

    def test_collinear_overlap(self):
        # the Greiner-Hormann killer: identical y-extents, overlapping x
        reg = PU.union_region([[box(0, 0, 4, 4)], [box(2, 0, 6, 4)]])
        assert len(reg) == 1
        assert PC.region_area(reg) == pytest.approx(24.0)

    def test_identical_boxes(self):
        reg = PU.union_region([[box(1, 1, 3, 3)], [box(1, 1, 3, 3)]])
        assert len(reg) == 1
        assert PC.region_area(reg) == pytest.approx(4.0)

    def test_nested_boxes(self):
        reg = PU.union_region([[box(0, 0, 10, 10)], [box(2, 2, 4, 4)]])
        assert len(reg) == 1
        assert PC.region_area(reg) == pytest.approx(100.0)

    def test_hole_preserved(self):
        donut = [box(0, 0, 10, 10), box(3, 3, 7, 7)]
        reg = PU.union_region([donut, [box(20, 0, 21, 1)]])
        assert len(reg) == 2
        assert PC.region_area(reg) == pytest.approx(100.0 - 16.0 + 1.0)

    def test_hole_filled_by_other_feature(self):
        donut = [box(0, 0, 10, 10), box(3, 3, 7, 7)]
        plug = [box(3, 3, 7, 7)]
        reg = PU.union_region([donut, plug])
        assert len(reg) == 1
        assert PC.region_area(reg) == pytest.approx(100.0)

    def test_cross_shape(self):
        reg = PU.union_region([[box(4, 0, 6, 10)], [box(0, 4, 10, 6)]])
        assert len(reg) == 1
        assert PC.region_area(reg) == pytest.approx(20 + 20 - 4)

    def test_triangles_general_position(self):
        a = tri(0, 0, 8, 1, 3, 7)
        b = tri(2, -1, 9, 4, 1, 5)
        reg = PU.union_region([[a], [b]])
        expect = coverage_area([[a], [b]], lo=-2, hi=10, n=900)
        assert PC.region_area(reg) == pytest.approx(expect, rel=2e-2)


class TestUnionFuzz:
    @pytest.mark.parametrize("seed", [1, 2, 3, 4, 5])
    def test_random_boxes(self, seed):
        rng = np.random.default_rng(seed)
        feats = []
        for _ in range(8):
            x0, y0 = rng.uniform(0, 16, 2)
            w, h = rng.uniform(0.5, 5, 2)
            feats.append([box(x0, y0, x0 + w, y0 + h)])
        reg = PU.union_region(feats)
        expect = coverage_area(feats)
        assert PC.region_area(reg) == pytest.approx(expect, rel=1e-2)

    @pytest.mark.parametrize("seed", [11, 12, 13, 14, 15, 16])
    def test_random_grid_aligned_boxes(self, seed):
        """Integer-aligned boxes (maximal shared-edge degeneracy) vs an
        EXACT integer-grid coverage oracle."""
        rng = np.random.default_rng(seed)
        feats = []
        grid = np.zeros((20, 20), dtype=bool)
        for _ in range(10):
            x0, y0 = (int(v) for v in rng.integers(0, 12, 2))
            w, h = (int(v) for v in rng.integers(1, 6, 2))
            feats.append([box(float(x0), float(y0), float(x0 + w), float(y0 + h))])
            grid[y0 : y0 + h, x0 : x0 + w] = True
        reg = PU.union_region(feats)
        assert PC.region_area(reg) == pytest.approx(float(grid.sum()), abs=1e-9)

    @pytest.mark.parametrize("seed", [21, 22, 23])
    def test_random_triangles(self, seed):
        rng = np.random.default_rng(seed)
        feats = []
        for _ in range(6):
            pts = rng.uniform(0, 18, (3, 2))
            if abs(np.cross(pts[1] - pts[0], pts[2] - pts[0])) < 1.0:
                continue
            feats.append([np.vstack([pts, pts[:1]])])
        reg = PU.union_region(feats)
        expect = coverage_area(feats)
        assert PC.region_area(reg) == pytest.approx(expect, rel=2e-2)
