"""Small per-feature vector transforms.

Reference parity:
  * explode_collections — ogr2ogr -explodecollections /
    `gdal vector explode-collections`
    (apps/gdalalg_vector_explode_collections.cpp): one output feature per
    part of a multi-geometry; single-part geometries pass through with
    part_idx 0.
  * swap_xy — `gdal vector swap-xy` (apps/gdalalg_vector_swap_xy.cpp,
    OGRGeometry::swapXY): exchange x and y of every vertex.
  * make_point — `gdal vector make-point`
    (apps/gdalalg_vector_make_point.cpp): build point geometries from
    numeric x/y columns.
  * check_geometry — `gdal vector check-geometry`
    (apps/gdalalg_vector_check_geometry.cpp): per-feature validity scan;
    one output row per invalid feature with an ``error`` description and
    the error location (plus valid rows with NULL error when
    ``include_valid``). The reference delegates to GEOS IsValidDetail;
    here the polygon checks are re-derived in numpy: ring closure,
    minimum point count, repeated consecutive points, and proper
    self-intersection of non-adjacent ring segments.

All are per-row map transforms — embarrassingly parallel, no shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gdal_spark.functions import wkb as W


def explode_collections(df: DataFrame, wkb_col: str = "wkb") -> DataFrame:
    """Adds part_idx and replaces multi-geometries by their parts."""
    passthrough = [c for c in df.columns if c != wkb_col]
    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name != wkb_col]
        + [
            T.StructField("part_idx", T.IntegerType()),
            T.StructField(wkb_col, T.BinaryType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                rd = r._asdict()
                buf = bytes(rd[wkb_col])
                t, _ = W.parse(buf)
                base = [rd[c] for c in passthrough]
                if t == W.WKB_MULTIPOLYGON:
                    for j, rings in enumerate(W.polygon_rings(buf)):
                        rows.append(
                            base + [j, bytearray(W.write_polygon(list(rings)))]
                        )
                else:
                    rows.append(base + [0, bytearray(buf)])
            yield pd.DataFrame(
                rows, columns=passthrough + ["part_idx", wkb_col]
            )

    return df.mapInPandas(run, schema=out_schema)


def _swap_buf(buf: bytes) -> bytes:
    t, p = W.parse(buf)
    if t == W.WKB_POINT:
        return W.write_point(float(p[1]), float(p[0]))
    if t == W.WKB_LINESTRING:
        v = np.asarray(p, dtype=np.float64)
        return W.write_linestring(v[:, ::-1].copy())
    polys = [
        [np.ascontiguousarray(r[:, ::-1]) for r in rings]
        for rings in W.polygon_rings(buf)
    ]
    if t == W.WKB_POLYGON and len(polys) == 1:
        return W.write_polygon(polys[0])
    return W.write_multipolygon(polys)


def swap_xy(df: DataFrame, wkb_col: str = "wkb") -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.BinaryType())
    def _udf(col: pd.Series) -> pd.Series:
        return col.map(
            lambda v: None if v is None else bytearray(_swap_buf(bytes(v)))
        )

    return df.withColumn(wkb_col, _udf(F.col(wkb_col)))


def make_point(
    df: DataFrame, x_col: str, y_col: str, wkb_col: str = "wkb"
) -> DataFrame:
    """Point WKB from two numeric columns (gdalalg_vector_make_point.cpp)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.BinaryType())
    def _udf(x: pd.Series, y: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None if (xv != xv or yv != yv) else
                bytearray(W.write_point(float(xv), float(yv)))
                for xv, yv in zip(x, y)
            ]
        )

    return df.withColumn(wkb_col, _udf(F.col(x_col), F.col(y_col)))


def _proper_cross(p1, p2, p3, p4) -> tuple[float, float] | None:
    """Strict interior crossing of segments p1p2 / p3p4 (shared endpoints of
    adjacent ring segments are not errors)."""
    d1x, d1y = p2[0] - p1[0], p2[1] - p1[1]
    d2x, d2y = p4[0] - p3[0], p4[1] - p3[1]
    den = d1x * d2y - d1y * d2x
    if den == 0.0:
        return None
    t = ((p3[0] - p1[0]) * d2y - (p3[1] - p1[1]) * d2x) / den
    u = ((p3[0] - p1[0]) * d1y - (p3[1] - p1[1]) * d1x) / den
    eps = 1e-12
    if eps < t < 1 - eps and eps < u < 1 - eps:
        return (p1[0] + t * d1x, p1[1] + t * d1y)
    return None


def check_ring(ring: np.ndarray) -> tuple[str, float, float] | None:
    """First validity error of one closed ring, or None."""
    if len(ring) < 4:
        return ("too few points in ring", float(ring[0][0]), float(ring[0][1]))
    if ring[0][0] != ring[-1][0] or ring[0][1] != ring[-1][1]:
        return ("ring not closed", float(ring[0][0]), float(ring[0][1]))
    dup = (ring[1:, 0] == ring[:-1, 0]) & (ring[1:, 1] == ring[:-1, 1])
    if dup.any():
        i = int(np.argmax(dup))
        return ("repeated point", float(ring[i][0]), float(ring[i][1]))
    n = len(ring) - 1  # segments
    for i in range(n):
        # non-adjacent segments only; (0, n-1) are adjacent on a closed ring
        for j in range(i + 2, n - (1 if i == 0 else 0)):
            hit = _proper_cross(ring[i], ring[i + 1], ring[j], ring[j + 1])
            if hit is not None:
                return ("self-intersection", hit[0], hit[1])
    return None


def check_geometry(
    df: DataFrame, wkb_col: str = "wkb", include_valid: bool = False
) -> DataFrame:
    """Per-feature validity report (gdalalg_vector_check_geometry.cpp)."""
    passthrough = [c for c in df.columns if c != wkb_col]
    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name != wkb_col]
        + [
            T.StructField("error", T.StringType()),
            T.StructField("err_x", T.DoubleType()),
            T.StructField("err_y", T.DoubleType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                rd = r._asdict()
                base = [rd[c] for c in passthrough]
                err = None
                for rings in W.polygon_rings(bytes(rd[wkb_col])):
                    for ring in rings:
                        err = check_ring(np.asarray(ring, dtype=np.float64))
                        if err is not None:
                            break
                    if err is not None:
                        break
                if err is not None:
                    rows.append(base + [err[0], err[1], err[2]])
                elif include_valid:
                    rows.append(base + [None, None, None])
            yield pd.DataFrame(
                rows, columns=passthrough + ["error", "err_x", "err_y"]
            )

    return df.mapInPandas(run, schema=out_schema)


def reproject_wkb(
    df: DataFrame,
    s_srs: str,
    t_srs: str,
    wkb_col: str = "wkb",
) -> DataFrame:
    """ogr2ogr -s_srs/-t_srs on WKB geometry: every vertex runs through
    the engine's CRS transforms (functions/crs.py 4326-hub composition,
    the OGRCoordinateTransformation role) array-at-a-time inside Arrow
    batches — one vectorized kernel call per geometry, zero per-vertex
    Python in the loop body."""
    from gdal_spark.functions import crs as C

    if not (C.supported(s_srs) and C.supported(t_srs)):
        raise ValueError(f"unsupported CRS pair {s_srs} -> {t_srs}")

    @F.pandas_udf(T.BinaryType())
    def _tr(col: pd.Series) -> pd.Series:
        fn = lambda xs, ys: C.transform(s_srs, t_srs, xs, ys)  # noqa: E731
        return col.map(lambda b: bytearray(W.map_coords(bytes(b), fn)))

    return df.withColumn(wkb_col, _tr(F.col(wkb_col)))
