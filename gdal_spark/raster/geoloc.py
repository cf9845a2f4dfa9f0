"""Geolocation-array transformer — alg/gdalgeoloc.cpp +
alg/gdalgeolocquadtree.cpp (swath data: per-cell lon/lat arrays instead
of an affine geotransform; netCDF/HDF GEOLOCATION metadata domain).

* ``pixel_to_geo`` — GDALGeoLoc::Transform forward path: raster
  pixel/line -> geoloc-array coordinates via PIXEL/LINE_OFFSET/STEP and
  the center-vs-corner convention offset, then
  PixelLineToXY (:371-527): bilinear interpolation inside the array
  with infinite edge extension (the right/bottom-edge one-cell retreat
  retries) and nodata rejection.
* ``geo_to_pixel`` — the quadtree inverse path
  (GDALGeoLocInverseTransformQuadtree): locate the geoloc quad whose
  4-gon contains the geo point (bbox prefilter + even-odd ring test,
  numpy-vectorized over all quads instead of a CPLQuadTree), then the
  EXACT inverse bilinear interpolation (GDALInverseBilinearInterpolation
  :952-1010 — the quadratic-in-s method), mapped back through
  STEP/OFFSET. Dateline shifting is not implemented (documented
  deviation; swaths crossing +/-180 need ShiftGeoX).
* ``transform_geolocations`` — gdal.Transformer.TransformGeolocations:
  apply any (x, y) -> (X, Y) callable to the geoloc arrays in place.
"""

from __future__ import annotations

import numpy as np


class GeoLocTransformer:
    def __init__(
        self,
        lon_array: np.ndarray,
        lat_array: np.ndarray,
        pixel_offset: float = 0.0,
        line_offset: float = 0.0,
        pixel_step: float = 1.0,
        line_step: float = 1.0,
        origin_top_left: bool = True,
        nodata: float | None = None,
    ):
        self.gx = np.asarray(lon_array, float)
        self.gy = np.asarray(lat_array, float)
        if self.gx.shape != self.gy.shape or self.gx.ndim != 2:
            raise ValueError("lon/lat arrays must be equal-shape 2D")
        self.h, self.w = self.gx.shape
        self.pixel_offset = float(pixel_offset)
        self.line_offset = float(line_offset)
        self.pixel_step = float(pixel_step)
        self.line_step = float(line_step)
        self.conv_offset = 0.0 if origin_top_left else 0.5
        self.nodata = nodata

    # -- PixelLineToXY (:371-527) -------------------------------------------
    def _pl_to_xy(self, p: float, l_: float):
        gx, gy, w, h = self.gx, self.gy, self.w, self.h
        iX = int(min(max(0.0, p), w - 1))
        iY = int(min(max(0.0, l_), h - 1))
        for _ in range(2):
            v00x, v00y = gx[iY, iX], gy[iY, iX]
            if self.nodata is not None and v00x == self.nodata:
                return None
            if iX + 1 < w and iY + 1 < h:
                v10x, v10y = gx[iY, iX + 1], gy[iY, iX + 1]
                v01x, v01y = gx[iY + 1, iX], gy[iY + 1, iX]
                v11x, v11y = gx[iY + 1, iX + 1], gy[iY + 1, iX + 1]
                if self.nodata is None or (
                    v10x != self.nodata
                    and v01x != self.nodata
                    and v11x != self.nodata
                ):
                    tx, ty = p - iX, l_ - iY
                    X = (1 - ty) * (v00x + tx * (v10x - v00x)) + ty * (
                        v01x + tx * (v11x - v01x)
                    )
                    Y = (1 - ty) * (v00y + tx * (v10y - v00y)) + ty * (
                        v01y + tx * (v11y - v01y)
                    )
                    return X, Y
            # edge retreats (infinite extension beyond borders)
            if iX == w - 1 and iX >= 1 and iY + 1 < h:
                iX -= 1
                continue
            if iY == h - 1 and iY >= 1 and iX + 1 < w:
                iY -= 1
                continue
            if iX == w - 1 and iY == h - 1 and iX >= 1 and iY >= 1:
                iX -= 1
                iY -= 1
                continue
            if iX + 1 < w and (
                self.nodata is None or gx[iY, iX + 1] != self.nodata
            ):
                tx = p - iX
                return (
                    v00x + tx * (gx[iY, iX + 1] - v00x),
                    v00y + tx * (gy[iY, iX + 1] - v00y),
                )
            if iY + 1 < h and (
                self.nodata is None or gx[iY + 1, iX] != self.nodata
            ):
                ty = l_ - iY
                return (
                    v00x + ty * (gx[iY + 1, iX] - v00x),
                    v00y + ty * (gy[iY + 1, iX] - v00y),
                )
            return v00x, v00y
        return None

    def pixel_to_geo(self, px, py):
        px = np.atleast_1d(np.asarray(px, float))
        py = np.atleast_1d(np.asarray(py, float))
        ox = np.full(px.shape, np.nan)
        oy = np.full(px.shape, np.nan)
        for idx in np.ndindex(px.shape):
            p = (px[idx] - self.pixel_offset) / self.pixel_step - self.conv_offset
            l_ = (py[idx] - self.line_offset) / self.line_step - self.conv_offset
            r = self._pl_to_xy(p, l_)
            if r is not None:
                ox[idx], oy[idx] = r
        if ox.size == 1:
            return float(ox.ravel()[0]), float(oy.ravel()[0])
        return ox, oy

    # -- exact inverse bilinear (:952-1010) -----------------------------------
    @staticmethod
    def _inverse_bilinear(x, y, x0, y0, x1, y1, x2, y2, x3, y3, i, j):
        A = (x0 - x) * (y0 - y2) - (y0 - y) * (x0 - x2)
        B = (
            ((x0 - x) * (y1 - y3) - (y0 - y) * (x1 - x3))
            + ((x1 - x) * (y0 - y2) - (y1 - y) * (x0 - x2))
        ) / 2
        C = (x1 - x) * (y1 - y3) - (y1 - y) * (x1 - x3)
        denom = A - 2 * B + C
        mag = abs(A) + abs(B) + abs(C)
        if abs(denom) <= 1e-12 * mag:
            s = A / (A - C)
        else:
            sq = np.sqrt(max(B * B - A * C, 0.0))
            s1 = ((A - B) + sq) / denom
            s2 = ((A - B) - sq) / denom
            s = s2 if (s1 < 0 or s1 > 1) else s1
        t_den_x = (1 - s) * (x0 - x2) + s * (x1 - x3)
        if abs(t_den_x) > 1e-12 * mag:
            i += ((1 - s) * (x0 - x) + s * (x1 - x)) / t_den_x
        else:
            t_den_y = (1 - s) * (y0 - y2) + s * (y1 - y3)
            if abs(t_den_y) > 1e-12 * mag:
                i += ((1 - s) * (y0 - y) + s * (y1 - y)) / t_den_y
        return i, j + s

    @staticmethod
    def _point_in_quad(x, y, xs, ys):
        inside = False
        n = 4
        for a in range(n):
            b = (a + 1) % n
            xa, ya, xb, yb = xs[a], ys[a], xs[b], ys[b]
            if (ya > y) != (yb > y):
                xi = xa + (y - ya) / (yb - ya) * (xb - xa)
                if x < xi:
                    inside = not inside
            # boundary counts as inside (isPointOnRingBoundary)
            if (
                min(xa, xb) - 1e-15 <= x <= max(xa, xb) + 1e-15
                and min(ya, yb) - 1e-15 <= y <= max(ya, yb) + 1e-15
            ):
                dx, dy = xb - xa, yb - ya
                cross = dx * (y - ya) - dy * (x - xa)
                d2 = dx * dx + dy * dy
                if d2 > 0 and abs(cross) <= 1e-12 * np.sqrt(d2):
                    return True
        return inside

    def geo_to_pixel(self, gx_q, gy_q):
        gx_q = np.atleast_1d(np.asarray(gx_q, float))
        gy_q = np.atleast_1d(np.asarray(gy_q, float))
        # per-quad corner + bbox precompute (vectorized slicing)
        x00 = self.gx[:-1, :-1]
        x10 = self.gx[:-1, 1:]
        x01 = self.gx[1:, :-1]
        x11 = self.gx[1:, 1:]
        y00 = self.gy[:-1, :-1]
        y10 = self.gy[:-1, 1:]
        y01 = self.gy[1:, :-1]
        y11 = self.gy[1:, 1:]
        bx0 = np.minimum(np.minimum(x00, x10), np.minimum(x01, x11))
        bx1 = np.maximum(np.maximum(x00, x10), np.maximum(x01, x11))
        by0 = np.minimum(np.minimum(y00, y10), np.minimum(y01, y11))
        by1 = np.maximum(np.maximum(y00, y10), np.maximum(y01, y11))
        ox = np.full(gx_q.shape, np.nan)
        oy = np.full(gx_q.shape, np.nan)
        for idx in np.ndindex(gx_q.shape):
            X, Y = gx_q[idx], gy_q[idx]
            cand = np.argwhere(
                (bx0 <= X) & (X <= bx1) & (by0 <= Y) & (Y <= by1)
            )
            for qy, qx in cand:
                # corner naming per the quadtree caller: 0=(i,j),
                # 1=(i,j+1) down, 2=(i+1,j) right, 3=(i+1,j+1)
                c = dict(
                    x0=x00[qy, qx], y0=y00[qy, qx],
                    x2=x10[qy, qx], y2=y10[qy, qx],
                    x1=x01[qy, qx], y1=y01[qy, qx],
                    x3=x11[qy, qx], y3=y11[qy, qx],
                )
                xs = [c["x0"], c["x2"], c["x3"], c["x1"]]
                ys = [c["y0"], c["y2"], c["y3"], c["y1"]]
                if self.nodata is not None and self.nodata in xs:
                    continue
                if not self._point_in_quad(X, Y, xs, ys):
                    continue
                i, j = self._inverse_bilinear(
                    X, Y,
                    c["x0"], c["y0"], c["x1"], c["y1"],
                    c["x2"], c["y2"], c["x3"], c["y3"],
                    float(qx), float(qy),
                )
                ox[idx] = (i + self.conv_offset) * self.pixel_step + self.pixel_offset
                oy[idx] = (j + self.conv_offset) * self.line_step + self.line_offset
                break
        if ox.size == 1:
            return float(ox.ravel()[0]), float(oy.ravel()[0])
        return ox, oy


def transform_geolocations(lon_array, lat_array, fn):
    """gdal.Transformer.TransformGeolocations: rewrite the geolocation
    arrays in place through fn(lon, lat) -> (X, Y)."""
    lon = np.asarray(lon_array, float)
    lat = np.asarray(lat_array, float)
    X, Y = fn(lon.ravel(), lat.ravel())
    return X.reshape(lon.shape), Y.reshape(lat.shape)
