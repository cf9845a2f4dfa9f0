"""SimpleSURF-style feature matching (alg/gdal_simplesurf.cpp) goldens."""

from __future__ import annotations

import numpy as np

from gdal_spark.raster import matching as M


def _blob_image(centers, size=96, radius=4, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.uniform(95, 105, (size, size))
    yy, xx = np.mgrid[0:size, 0:size]
    for cx, cy in centers:
        img += 150.0 * np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * radius**2))
    return np.clip(img, 0, 255)


class TestIntegralImage:
    def test_box_sums(self):
        rng = np.random.default_rng(1)
        img = rng.uniform(0, 10, (20, 30))
        s = M.integral_image(img)
        assert abs(s[-1, -1] - img.sum()) < 1e-6
        assert abs(M._box(s, 3, 7, 5, 11) - img[3:7, 5:11].sum()) < 1e-6


class TestDetect:
    def test_blobs_found_at_centers(self):
        centers = [(25, 25), (70, 30), (40, 70)]
        pts = M.detect(_blob_image(centers), threshold=0.0005)
        assert len(pts) >= 3
        for cx, cy in centers:
            d = min(abs(p["x"] - cx) + abs(p["y"] - cy) for p in pts)
            assert d <= 3, (cx, cy)

    def test_flat_image_no_points(self):
        assert M.detect(np.full((64, 64), 128.0), threshold=0.0005) == []


class TestMatching:
    def test_shifted_image_recovers_offset(self):
        centers = [(25, 25), (70, 30), (40, 70), (60, 60)]
        img1 = _blob_image(centers)
        shift = 6
        img2 = _blob_image([(cx + shift, cy) for cx, cy in centers])
        pairs = M.compute_matching_points(img1, img2, threshold=0.0005)
        assert len(pairs) >= 3
        dxs = [x2 - x1 for x1, y1, x2, y2 in pairs]
        dys = [y2 - y1 for x1, y1, x2, y2 in pairs]
        assert abs(np.median(dxs) - shift) <= 1
        assert abs(np.median(dys)) <= 1

    def test_identity_match(self):
        img = _blob_image([(30, 30), (60, 70)])
        pairs = M.compute_matching_points(img, img, threshold=0.0005)
        assert len(pairs) >= 2
        for x1, y1, x2, y2 in pairs:
            assert (x1, y1) == (x2, y2)

    def test_ratio_test_rejects_ambiguous(self):
        # two identical blobs in img2 for one blob in img1: the
        # best/second-best ratio is ~1 -> match dropped
        img1 = _blob_image([(48, 48)])
        img2 = _blob_image([(30, 48), (66, 48)])
        p1 = M.detect(img1, 0.0005)
        p2 = M.detect(img2, 0.0005)
        pairs = M.match_points(p1, M.descriptors(img1, p1), p2, M.descriptors(img2, p2))
        # the ambiguous central blob must not match both-ways confidently
        assert len(pairs) <= 1
