"""Douglas-Peucker simplify + segmentize — pure-numpy geometry kernels.

Reference parity:
  * `gdal vector simplify` (apps/gdalalg_vector_simplify.cpp) /
    OGRGeometry::Simplify + SimplifyPreserveTopology (ogr/ogrgeometry.cpp,
    GEOS-backed) and the SQLite-dialect ST_Simplify /
    ST_SimplifyPreserveTopology (ogr/ogrsf_frmts/sqlite/
    ogrsqlitesqlfunctions.cpp).
  * `gdal vector segmentize` (apps/gdalalg_vector_segmentize.cpp) /
    OGRGeometry::segmentize (ogr/ogrgeometry.cpp:866-899): insert vertices
    so that no segment is longer than max_length.

Spark-first shape: these are per-geometry kernels invoked from the
registered ST_ SQL functions (Arrow-batched) or from `mapInPandas` over a
WKB column — embarrassingly parallel, no shuffle, scale-safe by
construction (cost is O(n log n) per geometry in its own task).
"""

from __future__ import annotations

import numpy as np

from gdal_spark.functions import wkb as W


def _seg_dist(pts: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Perpendicular distance of each point to segment a-b (distance to the
    point a when the chord is degenerate, as GEOS does for closed rings)."""
    d = b - a
    L2 = float(d @ d)
    if L2 <= 0.0:
        return np.hypot(pts[:, 0] - a[0], pts[:, 1] - a[1])
    t = np.clip(((pts - a) @ d) / L2, 0.0, 1.0)
    proj = a + t[:, None] * d
    return np.hypot(pts[:, 0] - proj[:, 0], pts[:, 1] - proj[:, 1])


def dp_simplify(coords: np.ndarray, tol: float) -> np.ndarray:
    """Douglas-Peucker on an open polyline (endpoints always kept).
    Iterative (explicit stack) so deep recursions on long lines can't blow
    the Python stack."""
    coords = np.asarray(coords, dtype=np.float64)
    n = len(coords)
    if n <= 2:
        return coords.copy()
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j - i < 2:
            continue
        inner = coords[i + 1 : j]
        dist = _seg_dist(inner, coords[i], coords[j])
        m = int(np.argmax(dist))
        if dist[m] > tol:
            k = i + 1 + m
            keep[k] = True
            stack.append((i, k))
            stack.append((k, j))
    return coords[keep]


def simplify_ring(ring: np.ndarray, tol: float) -> np.ndarray | None:
    """Simplify a closed ring (first == last). The ring is treated as a
    closed polyline anchored at its first vertex (the GEOS convention): the
    degenerate first->first chord keeps the farthest vertex, recursion
    proceeds from there. Returns None when the ring collapses below a
    valid polygon (< 4 points incl. closure) — callers emulating
    SimplifyPreserveTopology keep the original ring in that case."""
    ring = np.asarray(ring, dtype=np.float64)
    out = dp_simplify(ring, tol)
    if len(out) < 4:
        return None
    return out


def simplify_wkb(buf: bytes, tol: float, preserve: bool = False) -> bytes | None:
    """ST_Simplify / ST_SimplifyPreserveTopology over one WKB geometry.
    preserve=False drops rings that collapse (GEOS Simplify may return
    fewer rings); preserve=True keeps the original ring whenever the
    simplified one would be degenerate."""
    t, p = W.parse(buf)
    if t == W.WKB_POINT:
        return bytes(buf)
    if t == W.WKB_LINESTRING:
        return W.write_linestring(dp_simplify(np.asarray(p), tol))
    polys_out = []
    for rings in W.polygon_rings(buf):
        rr = []
        for idx, ring in enumerate(rings):
            s = simplify_ring(ring, tol)
            if s is None:
                if preserve:
                    rr.append(np.asarray(ring, dtype=np.float64))
                elif idx == 0:
                    rr = []  # exterior collapsed -> whole polygon vanishes
                    break
                # interior ring collapsed -> drop the hole
            else:
                rr.append(s)
        if rr:
            polys_out.append(rr)
    if not polys_out:
        return None if not preserve else bytes(buf)
    if t == W.WKB_POLYGON and len(polys_out) == 1:
        return W.write_polygon(polys_out[0])
    return W.write_multipolygon(polys_out)


def segmentize_line(coords: np.ndarray, max_len: float) -> np.ndarray:
    """OGRSimpleCurve::segmentize (ogr/ogrlinestring.cpp:2645-2800),
    exactly: direction canonicalization (reverse when the first point
    orders before the last so both traversals segmentize identically),
    the split tolerance sqdist - sqmax > 1e-5 * sqmax (re-segmentizing
    is a no-op — issue #1341), nIntermediate = floor(sqrt(sqdist /
    sqmax) - 1e-2), intermediates at j * seg / (n + 1)."""
    coords = np.asarray(coords, dtype=np.float64)
    if max_len <= 0.0:
        raise ValueError("max_len must be > 0")
    if len(coords) < 2:
        return coords
    if coords[0, 0] < coords[-1, 0] or (
        coords[0, 0] == coords[-1, 0] and coords[0, 1] < coords[-1, 1]
    ):
        return segmentize_line(coords[::-1], max_len)[::-1]
    sqmax = max_len * max_len
    out = []
    for i in range(len(coords)):
        out.append(coords[i])
        if i == len(coords) - 1:
            break
        dx = coords[i + 1, 0] - coords[i, 0]
        dy = coords[i + 1, 1] - coords[i, 1]
        sqd = dx * dx + dy * dy
        if sqd - sqmax > 1e-5 * sqmax:
            n = int(np.floor(np.sqrt(sqd / sqmax) - 1e-2))
            rx, ry = dx / (n + 1), dy / (n + 1)
            for j in range(1, n + 1):
                out.append(
                    np.array([coords[i, 0] + j * rx, coords[i, 1] + j * ry])
                )
    return np.vstack(out)


def segmentize_wkb(buf: bytes, max_len: float) -> bytes:
    t, p = W.parse(buf)
    if t == W.WKB_POINT:
        return bytes(buf)
    if t == W.WKB_LINESTRING:
        return W.write_linestring(segmentize_line(np.asarray(p), max_len))
    polys = [
        [segmentize_line(r, max_len) for r in rings]
        for rings in W.polygon_rings(buf)
    ]
    if t == W.WKB_POLYGON and len(polys) == 1:
        return W.write_polygon(polys[0])
    return W.write_multipolygon(polys)


def n_points_wkb(buf: bytes) -> int:
    """Total vertex count (ST_NPoints; closure vertex counted, matching
    OGR's GetNumPoints on closed rings)."""
    t, p = W.parse(buf)
    if t == W.WKB_POINT:
        return 1
    if t == W.WKB_LINESTRING:
        return len(p)
    return sum(len(r) for rings in W.polygon_rings(buf) for r in rings)
