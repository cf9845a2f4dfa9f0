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
  STEP/OFFSET. With ``geographic_srs=True`` and longitudes within
  [-180,180] (bGeographicSRSWithMinus180Plus180LongRange), antimeridian
  swaths are handled exactly as the reference does:
  - forward: corner longitudes are shifted toward the (iX, iY) corner
    by +/-360 before interpolating, then renormalized
    (ShiftGeoX/UnshiftGeoX, alg/gdalgeoloc.h:72-85 +
    gdalgeoloc.cpp:437-449);
  - inverse: each crossing quad (all four |lon| > 170 and a pairwise
    jump > 180) is registered in TWO versions — corners shifted around
    -180 and around +180 (gdalgeolocquadtree.cpp:137-175, the
    BIT_IDX_RANGE_180 trick) — and mixed near-pole crossing quads are
    skipped entirely (:147-157).
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
        geographic_srs: bool = False,
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
        # bGeographicSRSWithMinus180Plus180LongRange (gdalgeoloc.cpp
        # :199-207): geographic SRS AND every longitude in [-180,180]
        valid = (
            self.gx
            if nodata is None
            else self.gx[self.gx != nodata]
        )
        self.wrap = bool(
            geographic_srs
            and valid.size
            and valid.min() >= -180.0
            and valid.max() <= 180.0
        )

    # -- ShiftGeoX / UnshiftGeoX (alg/gdalgeoloc.h:72-85, .cpp:71-86) -------
    def _shift_geo_x(self, x_ref: float, x: float) -> float:
        if not self.wrap:
            return x
        if x_ref < -170 and x > 170:
            return x - 360
        if x_ref > 170 and x < -170:
            return x + 360
        return x

    def _unshift_geo_x(self, x: float) -> float:
        if not self.wrap or (-180 <= x <= 180):
            return x
        x = np.fmod(x + 180.0, 360.0)
        return x + 180.0 if x < 0 else x - 180.0

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
                    # adjust corner longitudes toward the (iX, iY) corner
                    # before interpolating (gdalgeoloc.cpp:437-449)
                    v10x = self._shift_geo_x(v00x, v10x)
                    v01x = self._shift_geo_x(v00x, v01x)
                    v11x = self._shift_geo_x(v00x, v11x)
                    tx, ty = p - iX, l_ - iY
                    X = (1 - ty) * (v00x + tx * (v10x - v00x)) + ty * (
                        v01x + tx * (v11x - v01x)
                    )
                    Y = (1 - ty) * (v00y + tx * (v10y - v00y)) + ty * (
                        v01y + tx * (v11y - v01y)
                    )
                    return self._unshift_geo_x(X), Y
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
                    self._unshift_geo_x(
                        v00x
                        + tx * (self._shift_geo_x(v00x, gx[iY, iX + 1]) - v00x)
                    ),
                    v00y + tx * (gy[iY, iX + 1] - v00y),
                )
            if iY + 1 < h and (
                self.nodata is None or gx[iY + 1, iX] != self.nodata
            ):
                ty = l_ - iY
                return (
                    self._unshift_geo_x(
                        v00x
                        + ty * (self._shift_geo_x(v00x, gx[iY + 1, iX]) - v00x)
                    ),
                    v00y + ty * (gy[iY + 1, iX] - v00y),
                )
            return self._unshift_geo_x(v00x), v00y
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

    def _quad_versions(self):
        """Per-quad corner/bbox tables. With antimeridian wrapping, a
        crossing quad (all four |lon| > 170 and a corner jump > 180) is
        emitted in TWO versions — longitudes shifted around -180 and
        around +180 (gdalgeolocquadtree.cpp:137-175) — and mixed
        near-pole crossing quads are skipped (:147-157)."""
        x00 = self.gx[:-1, :-1]
        x10 = self.gx[:-1, 1:]
        x01 = self.gx[1:, :-1]
        x11 = self.gx[1:, 1:]
        y00 = self.gy[:-1, :-1]
        y10 = self.gy[:-1, 1:]
        y01 = self.gy[1:, :-1]
        y11 = self.gy[1:, 1:]

        def bundle(xs, eligible):
            bx0 = np.minimum(np.minimum(xs[0], xs[1]), np.minimum(xs[2], xs[3]))
            bx1 = np.maximum(np.maximum(xs[0], xs[1]), np.maximum(xs[2], xs[3]))
            by0 = np.minimum(np.minimum(y00, y10), np.minimum(y01, y11))
            by1 = np.maximum(np.maximum(y00, y10), np.maximum(y01, y11))
            return xs, (y00, y10, y01, y11), (bx0, bx1, by0, by1), eligible

        if not self.wrap:
            return [bundle((x00, x10, x01, x11), None)]
        over = [np.abs(a) > 170 for a in (x00, x10, x01, x11)]
        jump = (
            (np.abs(x10 - x00) > 180)
            | (np.abs(x01 - x00) > 180)
            | (np.abs(x11 - x00) > 180)
        )
        all170 = over[0] & over[1] & over[2] & over[3]
        any170 = over[0] | over[1] | over[2] | over[3]
        crossing = all170 & jump
        skip = any170 & jump & ~all170
        base_ok = None if not skip.any() else ~skip

        def shifted(ref):
            if ref < 0:  # ShiftGeoX toward -180: lon > 170 -> lon - 360
                return tuple(
                    np.where(crossing & (a > 170), a - 360, a)
                    for a in (x00, x10, x01, x11)
                )
            return tuple(  # toward +180: lon < -170 -> lon + 360
                np.where(crossing & (a < -170), a + 360, a)
                for a in (x00, x10, x01, x11)
            )

        out = [bundle(shifted(-180.0), base_ok)]
        if crossing.any():
            out.append(bundle(shifted(180.0), crossing))
        return out

    def geo_to_pixel(self, gx_q, gy_q):
        gx_q = np.atleast_1d(np.asarray(gx_q, float))
        gy_q = np.atleast_1d(np.asarray(gy_q, float))
        versions = self._quad_versions()
        ox = np.full(gx_q.shape, np.nan)
        oy = np.full(gx_q.shape, np.nan)
        for idx in np.ndindex(gx_q.shape):
            X, Y = gx_q[idx], gy_q[idx]
            found = False
            for xs_c, ys_c, (bx0, bx1, by0, by1), eligible in versions:
                x00, x10, x01, x11 = xs_c
                y00, y10, y01, y11 = ys_c
                hit = (bx0 <= X) & (X <= bx1) & (by0 <= Y) & (Y <= by1)
                if eligible is not None:
                    hit = hit & eligible
                for qy, qx in np.argwhere(hit):
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
                    ox[idx] = (
                        i + self.conv_offset
                    ) * self.pixel_step + self.pixel_offset
                    oy[idx] = (
                        j + self.conv_offset
                    ) * self.line_step + self.line_offset
                    found = True
                    break
                if found:
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
