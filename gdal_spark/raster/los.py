"""Line-of-sight — alg/los.cpp GDALIsLineOfSightVisible (GDAL 3.9).

Semantics transcribed:
  * endpoint pre-checks (z >= terrain, equality visible, :211-222);
  * same-cell trivial visibility;
  * exact vertical / horizontal scan loops with lerped test height
    (:233-330);
  * general case: integer Bresenham walk (the balance-counter variant
    of Bresenham2D:38-110) with the test height lerped by the
    EUCLIDEAN ratio sqrt((dx^2+dy^2)/(DX^2+DY^2)) (:338-353);
  * first failing cell reported as the terrain intersection, (-1, -1)
    when fully visible;
  * out-of-range endpoints raise (the RasterIO window error).

Distributed form ``los_tiles``: the DEM rides in the UDF closure;
each Arrow batch of (A, B, z) query rows is answered independently —
embarrassingly parallel, no shuffle.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


def _above(dem: np.ndarray, x: int, y: int, z: float) -> bool:
    h, w = dem.shape
    if not (0 <= x < w and 0 <= y < h):
        raise IndexError("Access window out of range in RasterIO()")
    return z >= float(dem[y, x])


def is_line_of_sight_visible(
    dem: np.ndarray, xA: int, yA: int, zA: float, xB: int, yB: int, zB: float
) -> tuple[bool, int, int]:
    """Returns (is_visible, col_intersection, row_intersection)."""
    dem = np.asarray(dem)
    if not _above(dem, xA, yA, zA):
        return False, xA, yA
    if not _above(dem, xB, yB, zB):
        return False, xB, yB
    if xA == xB and yA == yB:
        return True, -1, -1

    def lerp(a, b, t):
        return a + t * (b - a)

    if xA == xB:  # vertical scan
        step = 1 if yB > yA else -1
        for y in range(yA, yB + step, step):
            z = lerp(zA, zB, (y - yA) / (yB - yA))
            if not _above(dem, xA, y, z):
                return False, xA, y
        return True, -1, -1
    if yA == yB:  # horizontal scan
        step = 1 if xB > xA else -1
        for x in range(xA, xB + step, step):
            z = lerp(zA, zB, (x - xA) / (xB - xA))
            if not _above(dem, x, yA, z):
                return False, x, yA
        return True, -1, -1

    # Bresenham2D walk with euclidean-ratio z interpolation
    r_denom = (xB - xA) ** 2 + (yB - yA) ** 2

    def check(x: int, y: int):
        ratio = math.sqrt(((x - xA) ** 2 + (y - yA) ** 2) / r_denom)
        return _above(dem, x, y, lerp(zA, zB, ratio))

    dx, incx = (xB - xA, 1) if xB >= xA else (xA - xB, -1)
    dy, incy = (yB - yA, 1) if yB >= yA else (yA - yB, -1)
    x, y = xA, yA
    if dx >= dy:
        dy2 = dy * 2
        balance = dy2 - dx
        dx2 = dx * 2
        while x != xB:
            if not check(x, y):
                return False, x, y
            if balance >= 0:
                y += incy
                balance -= dx2
            balance += dy2
            x += incx
        if not check(x, y):
            return False, x, y
    else:
        dx2 = dx * 2
        balance = dx2 - dy
        dy2 = dy * 2
        while y != yB:
            if not check(x, y):
                return False, x, y
            if balance >= 0:
                x += incx
                balance -= dy2
            balance += dx2
            y += incy
        if not check(x, y):
            return False, x, y
    return True, -1, -1


def los_tiles(df, dem: np.ndarray):
    """Distributed LOS over a query table (query_id, xa, ya, za, xb, yb,
    zb) against one broadcast DEM: (query_id, visible, ix, iy)."""
    from pyspark.sql import types as T

    dem = np.asarray(dem, float)
    sch = T.StructType(
        [
            T.StructField("query_id", T.StringType()),
            T.StructField("visible", T.BooleanType()),
            T.StructField("ix", T.IntegerType()),
            T.StructField("iy", T.IntegerType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                vis, ix, iy = is_line_of_sight_visible(
                    dem, int(r.xa), int(r.ya), float(r.za),
                    int(r.xb), int(r.yb), float(r.zb),
                )
                rows.append((r.query_id, vis, ix, iy))
            yield pd.DataFrame(rows, columns=[f.name for f in sch.fields])

    return df.mapInPandas(run, sch)
