"""Greiner-Hormann boolean kernel vs raster-mask oracle.

Result rings' edges are sub-segments of the input rings' edges, so
rasterizing the result (even-odd) must classify every pixel center
exactly like the boolean of the inputs' rasterized masks — a sharp,
shapely-free oracle.
"""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.functions import geom as G
from gdal_spark.functions import polyclip as PC
from gdal_spark.raster import kernels as K

H = W = 48


def _mask(rings):
    if not rings:
        return np.zeros((H, W), dtype=bool)
    m = np.zeros((H, W), dtype=bool)
    for r in rings:
        m ^= K.rasterize_rings([r], H, W)  # even-odd composition
    return m


def _convex(rng, cx, cy, rad, n=7):
    ang = np.sort(rng.uniform(0, 2 * np.pi, n))
    return np.column_stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)])


def _star(rng, cx, cy, rad, n=10):
    ang = np.sort(rng.uniform(0, 2 * np.pi, n))
    rr = rng.uniform(0.35 * rad, rad, n)
    return np.column_stack([cx + rr * np.cos(ang), cy + rr * np.sin(ang)])


OPS = ["intersection", "union", "difference"]


def _apply(ma, mb, op):
    return {"intersection": ma & mb, "union": ma | mb, "difference": ma & ~mb}[op]


class TestClipRings:
    @pytest.mark.parametrize("seed", range(12))
    @pytest.mark.parametrize("op", OPS)
    def test_random_pairs_mask_oracle(self, seed, op):
        rng = np.random.default_rng(seed)
        a = _star(rng, rng.uniform(14, 34), rng.uniform(14, 34), rng.uniform(8, 14))
        b = _convex(rng, rng.uniform(14, 34), rng.uniform(14, 34), rng.uniform(8, 14))
        out = PC.clip_rings(a, b, op)
        got = _mask(out)
        want = _apply(_mask([a]), _mask([b]), op)
        mism = (got != want).sum()
        assert mism == 0, f"{op} seed {seed}: {mism} pixels differ"
        # area agrees with the even-odd area formula
        assert PC.rings_area(out) == pytest.approx(
            float(want.sum()), abs=0.08 * H * W + 20
        )

    @pytest.mark.parametrize("op", OPS)
    def test_disjoint_and_contained(self, op):
        a = np.array([[5, 5], [20, 5], [20, 20], [5, 20]], dtype=float)
        b_far = a + 25.0
        b_in = np.array([[8, 8], [14, 8], [14, 14], [8, 14]], dtype=float)
        for b in (b_far, b_in):
            out = PC.clip_rings(a, b, op)
            assert np.array_equal(_mask(out), _apply(_mask([a]), _mask([b]), op))

    def test_difference_hole_area(self):
        a = np.array([[5, 5], [25, 5], [25, 25], [5, 25]], dtype=float)
        b = np.array([[10, 10], [15, 10], [15, 15], [10, 15]], dtype=float)
        out = PC.clip_rings(a, b, "difference")
        assert PC.rings_area(out) == pytest.approx(20 * 20 - 5 * 5)


class TestPolygonOpHoles:
    @pytest.mark.parametrize("seed", range(6))
    @pytest.mark.parametrize("op", ["intersection", "difference"])
    def test_subject_with_hole(self, seed, op):
        rng = np.random.default_rng(100 + seed)
        ext = _convex(rng, 22, 22, 16, n=8)
        hole = _convex(rng, 22, 22, 6, n=6)
        b = _convex(rng, rng.uniform(12, 32), rng.uniform(12, 32), 10, n=7)
        out = PC.polygon_op([ext, hole], [b], op)
        got = _mask(out)
        ma = _mask([ext]) & ~_mask([hole])
        want = _apply(ma, _mask([b]), op)
        assert (got != want).sum() == 0, f"{op} seed {seed}"
