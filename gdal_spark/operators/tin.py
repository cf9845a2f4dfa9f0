"""Delaunay TIN construction + linear interpolation (GDAL 'linear'
gridding algorithm: alg/gdalgrid.cpp GGA_Linear via
GDALTriangulationCreateDelaunay, alg/delaunay.c — qhull-backed there,
Bowyer-Watson here).

``delaunay`` is the incremental Bowyer-Watson algorithm: each inserted
point removes the triangles whose circumcircle contains it and re-fans
the resulting cavity boundary.  ``tin_interpolate`` evaluates the GDAL
linear gridder: barycentric interpolation inside the containing
triangle, nodata outside the convex hull (GDALGridLinear's
dfNoDataValue path when the point falls in no triangle).

Scale path: like the rest of the grid family the TIN is built
per-partition from cell-block-local points plus a halo ring
(queries/gridding.py pattern) — triangulation is O(n log n)-ish per
block, never global.
"""

from __future__ import annotations

import numpy as np


def _circumcircle_contains(pts: np.ndarray, tri: tuple, p: np.ndarray) -> bool:
    a, b, c = pts[tri[0]], pts[tri[1]], pts[tri[2]]
    # in-circle determinant (positive for CCW triangle containing p)
    m = np.array(
        [
            [a[0] - p[0], a[1] - p[1], (a[0] - p[0]) ** 2 + (a[1] - p[1]) ** 2],
            [b[0] - p[0], b[1] - p[1], (b[0] - p[0]) ** 2 + (b[1] - p[1]) ** 2],
            [c[0] - p[0], c[1] - p[1], (c[0] - p[0]) ** 2 + (c[1] - p[1]) ** 2],
        ]
    )
    return float(np.linalg.det(m)) > 1e-12


def _ccw(pts: np.ndarray, i, j, k) -> bool:
    a, b, c = pts[i], pts[j], pts[k]
    return (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0]) > 0


def delaunay(points: np.ndarray) -> list[tuple[int, int, int]]:
    """Bowyer-Watson Delaunay triangulation; returns CCW index triples
    into ``points`` ((n, 2) float array, n >= 3, general position not
    required — degenerate cocircular splits are arbitrary but valid)."""
    pts = np.asarray(points, dtype=np.float64)
    n = len(pts)
    if n < 3:
        return []
    # super-triangle far outside the data
    cx, cy = pts[:, 0].mean(), pts[:, 1].mean()
    span = max(np.ptp(pts[:, 0]), np.ptp(pts[:, 1]), 1.0) * 1000.0
    ext = np.vstack(
        [pts, [cx - 2 * span, cy - span], [cx + 2 * span, cy - span], [cx, cy + 2 * span]]
    )
    s0, s1, s2 = n, n + 1, n + 2
    tris: list[tuple[int, int, int]] = [(s0, s1, s2)]

    for pi in range(n):
        p = ext[pi]
        bad = [t for t in tris if _circumcircle_contains(ext, t, p)]
        if not bad:
            # numerically on/outside every circle: attach to nearest edge
            # by treating the containing triangle as bad
            bad = [t for t in tris if _in_triangle(ext, t, p) is not None]
            if not bad:
                continue
        # cavity boundary = edges appearing in exactly one bad triangle
        edge_count: dict[tuple[int, int], int] = {}
        for t in bad:
            for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
                key = (min(e), max(e))
                edge_count[key] = edge_count.get(key, 0) + 1
        boundary = [e for e, c in edge_count.items() if c == 1]
        tris = [t for t in tris if t not in bad]
        for e in boundary:
            i, j = e
            tri = (i, j, pi) if _ccw(ext, i, j, pi) else (j, i, pi)
            tris.append(tri)

    return [
        t for t in tris if s0 not in t and s1 not in t and s2 not in t
    ]


def _in_triangle(pts: np.ndarray, tri: tuple, p: np.ndarray):
    a, b, c = pts[tri[0]], pts[tri[1]], pts[tri[2]]
    det = (b[0] - a[0]) * (c[1] - a[1]) - (c[0] - a[0]) * (b[1] - a[1])
    if abs(det) < 1e-300:
        return None
    l1 = ((b[0] - p[0]) * (c[1] - p[1]) - (c[0] - p[0]) * (b[1] - p[1])) / det
    l2 = ((c[0] - p[0]) * (a[1] - p[1]) - (a[0] - p[0]) * (c[1] - p[1])) / det
    l3 = 1.0 - l1 - l2
    eps = -1e-9
    if l1 >= eps and l2 >= eps and l3 >= eps:
        return l1, l2, l3
    return None


def tin_interpolate(
    points: np.ndarray,
    values: np.ndarray,
    qx: np.ndarray,
    qy: np.ndarray,
    nodata: float = np.nan,
) -> np.ndarray:
    """GDALGridLinear: barycentric interpolation on the Delaunay TIN;
    ``nodata`` outside the hull.  Vectorized per-triangle over queries."""
    pts = np.asarray(points, float)
    vals = np.asarray(values, float)
    qx = np.asarray(qx, float).ravel()
    qy = np.asarray(qy, float).ravel()
    out = np.full(len(qx), nodata, dtype=np.float64)
    done = np.zeros(len(qx), dtype=bool)
    for tri in delaunay(pts):
        if done.all():
            break
        a, b, c = pts[tri[0]], pts[tri[1]], pts[tri[2]]
        det = (b[0] - a[0]) * (c[1] - a[1]) - (c[0] - a[0]) * (b[1] - a[1])
        if abs(det) < 1e-300:
            continue
        l1 = ((b[0] - qx) * (c[1] - qy) - (c[0] - qx) * (b[1] - qy)) / det
        l2 = ((c[0] - qx) * (a[1] - qy) - (a[0] - qx) * (c[1] - qy)) / det
        l3 = 1.0 - l1 - l2
        eps = -1e-9
        inside = (~done) & (l1 >= eps) & (l2 >= eps) & (l3 >= eps)
        out[inside] = (
            l1[inside] * vals[tri[0]]
            + l2[inside] * vals[tri[1]]
            + l3[inside] * vals[tri[2]]
        )
        done |= inside
    return out


# --------------------------------------------------------------------------
# Concave hull (gdal vector concave-hull, apps/gdalalg_vector_concave_hull
# -> GEOS ConcaveHullOfPoints): chi-shape erosion of the Delaunay
# triangulation. threshold = shortest + ratio*(longest - shortest) over
# all triangulation edges; boundary triangles whose exposed edge exceeds
# the threshold are eaten, unless removal would pinch the shape (the
# opposite vertex already lies on the boundary). ratio=1.0 erodes nothing
# and returns the convex hull.
# --------------------------------------------------------------------------


def _edge(a: int, b: int) -> tuple[int, int]:
    return (a, b) if a < b else (b, a)


def concave_hull(points: np.ndarray, ratio: float) -> np.ndarray:
    """Returns the hull ring as an (n+1, 2) closed CCW coordinate array."""
    pts = np.asarray(points, dtype=np.float64)
    tris = delaunay(pts)
    if not tris:
        raise ValueError("concave_hull needs >= 3 non-collinear points")
    edge_tris: dict[tuple[int, int], list[tuple]] = {}
    for t in tris:
        for i in range(3):
            edge_tris.setdefault(_edge(t[i], t[(i + 1) % 3]), []).append(t)

    def elen(e):
        return float(np.hypot(*(pts[e[0]] - pts[e[1]])))

    lens = [elen(e) for e in edge_tris]
    thresh = min(lens) + ratio * (max(lens) - min(lens))

    alive = set(tris)
    boundary = {e for e, ts in edge_tris.items() if len(ts) == 1}
    bverts = {v for e in boundary for v in e}
    import heapq

    heap = [(-elen(e), e) for e in boundary]
    heapq.heapify(heap)
    frozen: set[tuple[int, int]] = set()
    while heap:
        neg, e = heapq.heappop(heap)
        if e not in boundary or e in frozen:
            continue
        if -neg <= thresh:
            break  # longest remaining boundary edge is short enough
        ts = [t for t in edge_tris[e] if t in alive]
        if len(ts) != 1:
            continue
        t = ts[0]
        opp = next(v for v in t if v not in e)
        if opp in bverts or len(alive) == 1:
            frozen.add(e)  # removal would pinch or empty the shape
            continue
        alive.remove(t)
        boundary.discard(e)
        for i in range(3):
            ne = _edge(t[i], t[(i + 1) % 3])
            if ne == e:
                continue
            boundary.add(ne)
            heapq.heappush(heap, (-elen(ne), ne))
        bverts.add(opp)

    # walk the boundary cycle
    adj: dict[int, list[int]] = {}
    for a, b in boundary:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    start = min(adj)
    ring = [start]
    prev, cur = -1, start
    while True:
        nxts = [v for v in adj[cur] if v != prev]
        nxt = nxts[0] if nxts else prev
        ring.append(nxt)
        if nxt == start:
            break
        prev, cur = cur, nxt
    coords = pts[ring]
    # orient CCW (positive shoelace)
    x, y = coords[:, 0], coords[:, 1]
    if 0.5 * float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1])) < 0:
        coords = coords[::-1]
    return coords
