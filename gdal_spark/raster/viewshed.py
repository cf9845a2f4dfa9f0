"""Viewshed + line-of-sight (alg/viewshed/) re-expressed in numpy.

GDAL's viewshed implements a modified Wang et al. (2000) "Generating
Viewsheds without Using Sightlines": rows are processed outward from the
observer row and, within a row, columns outward from the observer
column; each pixel's minimum unblocked height comes from a plane through
the observer and two already-processed inner neighbors —
CalcHeightLine / CalcHeightEdge / CalcHeightDiagonal
(alg/viewshed/viewshed_executor.cpp:61-115).  The cumulative array
stores max(actual z, required z) so blocking propagates along rays in a
single O(n^2) pass.

This module implements the default EDGE cell mode plus the DIAGONAL and
MIN/MAX combinations, observer/target height offsets, max-distance
masking, and gdal_viewshed's visible/invisible/out-of-range output
values (apps/gdal_viewshed.cpp defaults 255/0/0).

Spark integration: one viewshed per image partition-locally via
mapInPandas (gdal_spark/queries/morph_entries-style) — embarrassingly
parallel, no shuffle, scales with the image count.
"""

from __future__ import annotations

import numpy as np

VISIBLE = 255
INVISIBLE = 0
OUT_OF_RANGE = 0


def _height_line(d: int, za: float) -> float:
    # CalcHeightLine: plane degenerate case — straight ray continuation
    return za * d / (d - 1)


def _height_edge(i: int, j: int, za: float, zb: float) -> float:
    # CalcHeightEdge: plane through origin and the two inner neighbors
    return (za * i + zb * (j - i)) / (j - 1)


def _height_diag(i: int, j: int, za: float, zb: float) -> float:
    # CalcHeightDiagonal
    return (za * i + zb * j) / (i + j - 1)


def _required(mode: str, x: int, y: int, this_prev: float, last: float,
              last_prev: float) -> float:
    """Minimum unblocked height at offset (x, y>0), x>0, from the three
    inner neighbors (viewshed_executor.cpp doEdge/doDiagonal/doMin/doMax)."""
    if x == y:
        # diagonal ray: straight-line continuation through (x-1, y-1);
        # the first step touches the observer itself -> always visible
        return _height_line(x, last_prev) if x > 1 else -np.inf
    if mode == "diagonal":
        return _height_diag(x, y, this_prev, last)
    if x >= y:
        edge = _height_edge(y, x, last_prev, this_prev)
    else:
        edge = _height_edge(x, y, last_prev, last)
    if mode == "edge":
        return edge
    diag = _height_diag(x, y, this_prev, last)
    return min(edge, diag) if mode == "min" else max(edge, diag)


def viewshed(
    dem: np.ndarray,
    ox: int,
    oy: int,
    observer_height: float = 2.0,
    target_height: float = 0.0,
    max_distance: float | None = None,
    mode: str = "edge",
    visible_val: int = VISIBLE,
    invisible_val: int = INVISIBLE,
    out_of_range_val: int = OUT_OF_RANGE,
) -> np.ndarray:
    """Visibility raster from observer cell (ox, oy) over ``dem``."""
    if mode not in ("edge", "diagonal", "min", "max"):
        raise ValueError(f"unknown cell mode {mode!r}")
    h, w = dem.shape
    if not (0 <= ox < w and 0 <= oy < h):
        raise ValueError("observer outside raster")
    # heights relative to the observer eye
    z = dem.astype(np.float64) - (float(dem[oy, ox]) + observer_height)
    out = np.full((h, w), invisible_val, dtype=np.uint8)
    out[oy, ox] = visible_val

    # cumulative blocking height, filled row by row outward
    cum = np.zeros((h, w), dtype=np.float64)
    cum[oy, ox] = z[oy, ox]

    def visit(xi: int, yi: int, req: float) -> None:
        vis = z[yi, xi] + target_height >= req
        out[yi, xi] = visible_val if vis else invisible_val
        cum[yi, xi] = max(z[yi, xi], req)

    def sweep_row(yi: int, prev_yi: int | None) -> None:
        y = abs(yi - oy)
        if prev_yi is not None:
            # column directly in line with the observer: pure line propagation
            req = -np.inf if y == 1 else _height_line(y, cum[prev_yi, ox])
            visit(ox, yi, req)
        for direction in (1, -1):
            limit = w - ox - 1 if direction == 1 else ox
            for x in range(1, limit + 1):
                xi = ox + direction * x
                if y == 0:
                    req = -np.inf if x == 1 else _height_line(x, cum[yi, xi - direction])
                else:
                    req = _required(
                        mode, x, y,
                        cum[yi, xi - direction],
                        cum[prev_yi, xi],
                        cum[prev_yi, xi - direction],
                    )
                visit(xi, yi, req)

    sweep_row(oy, None)
    for yi in range(oy + 1, h):
        sweep_row(yi, yi - 1)
    for yi in range(oy - 1, -1, -1):
        sweep_row(yi, yi + 1)

    if max_distance is not None:
        yy, xx = np.mgrid[0:h, 0:w]
        far = (xx - ox) ** 2 + (yy - oy) ** 2 > max_distance**2
        out[far] = out_of_range_val
    return out


def line_of_sight(
    dem: np.ndarray,
    x0: int, y0: int, x1: int, y1: int,
    observer_height: float = 2.0,
    target_height: float = 0.0,
) -> tuple[bool, tuple[int, int] | None]:
    """gdal los / IsLineOfSightVisible analog: DDA walk of the sight
    segment sampling bilinear terrain; returns (visible, first_blocker).
    """
    z0 = float(dem[y0, x0]) + observer_height
    z1 = float(dem[y1, x1]) + target_height
    n = int(max(abs(x1 - x0), abs(y1 - y0)))
    if n == 0:
        return True, None
    for k in range(1, n):
        t = k / n
        xs, ys = x0 + (x1 - x0) * t, y0 + (y1 - y0) * t
        ix, iy = int(np.floor(xs)), int(np.floor(ys))
        fx, fy = xs - ix, ys - iy
        ix2, iy2 = min(ix + 1, dem.shape[1] - 1), min(iy + 1, dem.shape[0] - 1)
        terrain = (
            dem[iy, ix] * (1 - fx) * (1 - fy)
            + dem[iy, ix2] * fx * (1 - fy)
            + dem[iy2, ix] * (1 - fx) * fy
            + dem[iy2, ix2] * fx * fy
        )
        sight = z0 + (z1 - z0) * t
        if terrain > sight:
            return False, (int(round(xs)), int(round(ys)))
    return True, None
