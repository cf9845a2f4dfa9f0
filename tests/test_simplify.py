"""Douglas-Peucker simplify + segmentize kernels and ST_ catalog entries.

Oracles: hand-computed DP outcomes on engineered rings (collinear
subdivisions always vanish; a bump vertex survives iff its deviation
exceeds the tolerance) and exact segment-count arithmetic for segmentize
(OGRGeometry::segmentize, ogr/ogrgeometry.cpp:866-899)."""

import numpy as np
import pytest

from gdal_spark.functions import simplify as S
from gdal_spark.functions import wkb as W


def rect_ring(x0=0.0, y0=0.0, w=8.0, h=6.0):
    return np.array(
        [(x0, y0), (x0 + w, y0), (x0 + w, y0 + h), (x0, y0 + h), (x0, y0)],
        dtype=np.float64,
    )


class TestDP:
    def test_collinear_removed(self):
        line = np.array([[0, 0], [1, 0], [2, 0], [3, 0]], dtype=float)
        out = S.dp_simplify(line, 1e-9)
        np.testing.assert_array_equal(out, [[0, 0], [3, 0]])

    def test_bump_kept_vs_dropped(self):
        line = np.array([[0, 0], [2, 0.5], [4, 0]], dtype=float)
        assert len(S.dp_simplify(line, 0.4)) == 3
        assert len(S.dp_simplify(line, 0.6)) == 2

    def test_ring_subdivided_rect_recovers_corners(self):
        for m in (2, 3, 4):
            pts = []
            corners = [(0, 0), (8, 0), (8, 6), (0, 6)]
            for a, b in zip(corners, corners[1:] + corners[:1]):
                for j in range(m):
                    pts.append(
                        (a[0] + (b[0] - a[0]) * j / m, a[1] + (b[1] - a[1]) * j / m)
                    )
            pts.append(corners[0])
            ring = np.array(pts, dtype=float)
            out = S.simplify_ring(ring, 0.1)
            assert out is not None and len(out) == 5
            np.testing.assert_allclose(out, rect_ring())

    def test_ring_bump_threshold(self):
        for d, n_expect in [(0.0, 5), (0.08, 5), (0.12, 6), (0.16, 6)]:
            ring = np.array(
                [(0, 0), (4, -d), (8, 0), (8, 6), (0, 6), (0, 0)], dtype=float
            )
            out = S.simplify_ring(ring, 0.1)
            assert len(out) == n_expect, (d, len(out))

    def test_ring_collapse_returns_none(self):
        # near-degenerate sliver: everything within tol of the anchor
        ring = np.array(
            [(0, 0), (0.01, 0.0), (0.01, 0.01), (0, 0)], dtype=float
        )
        assert S.simplify_ring(ring, 1.0) is None

    def test_wkb_preserve_topology(self):
        sliver = W.write_polygon(
            [np.array([(0, 0), (0.01, 0.0), (0.01, 0.01), (0, 0)])]
        )
        assert S.simplify_wkb(sliver, 1.0) is None
        kept = S.simplify_wkb(sliver, 1.0, preserve=True)
        assert S.n_points_wkb(kept) == 4

    def test_wkb_hole_dropped_but_shell_kept(self):
        shell = rect_ring(0, 0, 20, 20)
        hole = np.array(
            [(5, 5), (5.01, 5.0), (5.01, 5.01), (5, 5)], dtype=float
        )
        buf = W.write_polygon([shell, hole])
        out = S.simplify_wkb(buf, 1.0)
        assert len(W.polygon_rings(out)[0]) == 1  # hole vanished


class TestSegmentize:
    def test_counts_and_lengths(self):
        for s, want in [(1.0, 29), (2.0, 15), (3.0, 11), (4.0, 9)]:
            out = S.segmentize_wkb(W.write_polygon([rect_ring()]), s)
            assert S.n_points_wkb(out) == want, s
            ring = W.polygon_rings(out)[0][0]
            seg = np.hypot(*(ring[1:] - ring[:-1]).T)
            assert seg.max() <= s + 1e-9
            # original perimeter preserved
            assert seg.sum() == pytest.approx(28.0)

    def test_original_vertices_preserved(self):
        line = np.array([[0, 0], [5, 0], [5, 7]], dtype=float)
        out = S.segmentize_line(line, 2.0)
        for v in line:
            assert (np.abs(out - v).sum(1) < 1e-12).any()

    def test_invalid_maxlen(self):
        with pytest.raises(ValueError):
            S.segmentize_line(np.zeros((2, 2)), 0.0)


class TestContractFixture:
    """The closed-form oracle of queries/simplify_entries.py, checked in
    pure numpy for every nation key."""

    def test_all_keys_match_closed_form(self):
        from gdal_spark.functions import geom as G
        from gdal_spark.queries.simplify_entries import TOL, _fixture_wkbs

        ks = np.arange(25)
        for kind in (0, 1):
            bufs = _fixture_wkbs(ks, np.full(25, kind))
            for k, buf in zip(ks, bufs):
                buf = bytes(buf)
                n_in = S.n_points_wkb(buf)
                simp = S.simplify_wkb(buf, TOL)
                n_out = S.n_points_wkb(simp)
                if kind == 0:
                    m = 2 + k % 3
                    assert n_in == 4 * m + 1 and n_out == 5
                    assert G.wkb_area(simp) == pytest.approx(48.0)
                else:
                    d = (k % 5) * 0.04
                    assert n_in == 6
                    assert n_out == (5 if k % 5 <= 2 else 6)
                    assert G.wkb_area(buf) == pytest.approx(48.0 + 4.0 * d)
