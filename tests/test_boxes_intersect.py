"""Vectorized box-vs-polygon intersects vs the pure clip-based oracle."""

from __future__ import annotations

import numpy as np

from gdal_spark.functions import geom, wkb


def poly_wkb(rings):
    return wkb.write_polygon([np.asarray(r, float) for r in rings])


CONCAVE = poly_wkb(
    [
        [[0, 0], [10, 0], [10, 2], [3, 2], [3, 8], [10, 8], [10, 10], [0, 10], [0, 0]],
        [[1, 4], [2, 4], [2, 6], [1, 6], [1, 4]],  # hole
    ]
)


def brute(buf, boxes):
    return np.array(
        [geom.clip_wkb_to_box(buf, *b) is not None for b in boxes], dtype=bool
    )


def test_vectorized_matches_clip_oracle_random():
    rng = np.random.default_rng(8)
    boxes = []
    for _ in range(300):
        x0, y0 = rng.uniform(-3, 12, 2)
        w, h = rng.uniform(0.2, 6, 2)
        boxes.append((x0, y0, x0 + w, y0 + h))
    b = np.array(boxes)
    got = geom.boxes_intersect_wkb(b[:, 0], b[:, 1], b[:, 2], b[:, 3], CONCAVE)
    np.testing.assert_array_equal(got, brute(CONCAVE, boxes))


def test_box_inside_hole_is_disjoint():
    got = geom.boxes_intersect_wkb(
        np.array([1.2]), np.array([4.2]), np.array([1.8]), np.array([5.8]), CONCAVE
    )
    assert not got[0]


def test_edge_crossing_without_containment():
    # thin horizontal strip crossing the concavity arm: no corner inside,
    # no vertex inside -> exercises the clip fallback
    got = geom.boxes_intersect_wkb(
        np.array([-2.0]), np.array([0.5]), np.array([12.0]), np.array([1.5]), CONCAVE
    )
    assert got[0]


def test_box_covering_whole_polygon():
    got = geom.boxes_intersect_wkb(
        np.array([-5.0]), np.array([-5.0]), np.array([15.0]), np.array([15.0]), CONCAVE
    )
    assert got[0]


def test_far_away_box():
    got = geom.boxes_intersect_wkb(
        np.array([100.0]), np.array([100.0]), np.array([101.0]), np.array([101.0]),
        CONCAVE,
    )
    assert not got[0]
