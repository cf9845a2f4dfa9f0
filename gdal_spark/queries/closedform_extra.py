"""More closed-form oracle twins: raster-as-features, footprint rings.

Same discipline as queries/closedform_raster.py: the SAME engine kernels
(codec roundtrip, `resample_nearest`, `footprint_gt`/`gt_pixel_to_geo`,
`region_rings`) re-run over rasters whose pixels are integer arithmetic
of (row, col, key), so DuckDB recomputes every output value and the
driver hash-checks what the RNG-fixture entries (`raster_as_features`,
`raster_footprint`) can only rows-only check.

  * raster_as_features_mod — decode -> 16->8 nearest overview (samples
    source (2i+1, 2j+1), the GWK center convention) -> per-pixel rows
    with georeferenced centers from the footprint geotransform
    (gdal_translate -of XYZ / "raster as features" semantics).
  * raster_footprint_rect — a rectangle valid-mask traced through the
    REAL `region_rings` boundary walk (gdal_footprint mask->polygonize,
    apps/gdal_footprint_lib.cpp:98-198): ring count, shoelace area and
    ring bbox are closed-form in k.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from gdal_spark.sources.tables import load

_N = 16


def _mod_raster(k: int) -> np.ndarray:
    r, c = np.meshgrid(np.arange(_N), np.arange(_N), indexing="ij")
    return ((r * 37 + c * 101 + k * 13) % 97).astype(np.uint8)


def _nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "nation").select("n_nationkey")


_FEAT_SCH = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("px", T.IntegerType()),
        T.StructField("py", T.IntegerType()),
        T.StructField("gx", T.DoubleType()),
        T.StructField("gy", T.DoubleType()),
        T.StructField("v", T.IntegerType()),
    ]
)


def raster_as_features_mod(spark: SparkSession, sf_dir: str) -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from gdal_spark.functions.tiff import tiff_decode, tiff_encode
        from gdal_spark.raster import kernels as K
        from gdal_spark.raster.warp import footprint_gt

        for pdf in batches:
            rows = []
            for k in pdf["n_nationkey"]:
                k = int(k)
                arr = tiff_decode(tiff_encode(_mod_raster(k)))
                small = K.resample_nearest(arr, 8, 8)
                gt = footprint_gt(float(k), 0.0, float(k) + 8.0, 8.0, 8, 8)
                for py in range(8):
                    for px in range(8):
                        gx, gy = K.gt_pixel_to_geo(gt, px + 0.5, py + 0.5)
                        rows.append(
                            (k, px, py, float(gx), float(gy),
                             int(small[py, px]))
                        )
            yield pd.DataFrame(rows, columns=[f.name for f in _FEAT_SCH.fields])

    return _nation(spark, sf_dir).mapInPandas(run, _FEAT_SCH)


_FEAT_ORACLE = """
    WITH g AS (
        SELECT py.range AS py, px.range AS px
        FROM range(8) py CROSS JOIN range(8) px
    )
    SELECT n_nationkey AS k, CAST(px AS INT) AS px, CAST(py AS INT) AS py,
           n_nationkey + px + 0.5 AS gx, 7.5 - py AS gy,
           CAST(((2*py + 1) * 37 + (2*px + 1) * 101 + n_nationkey * 13) % 97
                AS INT) AS v
    FROM nation CROSS JOIN g
"""


_FP_SCH = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("n_rings", T.IntegerType()),
        T.StructField("area_px", T.DoubleType()),
        T.StructField("rxmin", T.DoubleType()),
        T.StructField("rymin", T.DoubleType()),
        T.StructField("rxmax", T.DoubleType()),
        T.StructField("rymax", T.DoubleType()),
    ]
)


def raster_footprint_rect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rect mask rows [2, 2+4+(k%5)), cols [3, 3+5+(k%3)) of a 16x16
    3-band raster -> mask -> region_rings -> shoelace area + ring bbox."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from gdal_spark.functions.tiff import tiff_decode, tiff_encode
        from gdal_spark.raster import kernels as K

        for pdf in batches:
            rows = []
            for k in pdf["n_nationkey"]:
                k = int(k)
                rh, rw = 4 + k % 5, 5 + k % 3
                img = np.zeros((_N, _N, 3), dtype=np.uint8)
                img[2 : 2 + rh, 3 : 3 + rw] = 255
                arr = tiff_decode(tiff_encode(img))
                mask = arr.mean(axis=2) > 32
                rings = K.region_rings(mask)
                pts = np.vstack(rings)
                areas = 0.0
                for ring in rings:
                    x, y = ring[:, 0], ring[:, 1]
                    areas += abs(
                        0.5 * float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))
                    )
                rows.append(
                    (k, len(rings), areas,
                     float(pts[:, 0].min()), float(pts[:, 1].min()),
                     float(pts[:, 0].max()), float(pts[:, 1].max()))
                )
            yield pd.DataFrame(rows, columns=[f.name for f in _FP_SCH.fields])

    return _nation(spark, sf_dir).mapInPandas(run, _FP_SCH)


_FP_ORACLE = """
    SELECT n_nationkey AS k, CAST(1 AS INT) AS n_rings,
           CAST((4 + n_nationkey % 5) * (5 + n_nationkey % 3)
                AS DOUBLE) AS area_px,
           3.0 AS rxmin, 2.0 AS rymin,
           3.0 + 5 + n_nationkey % 3 AS rxmax,
           2.0 + 4 + n_nationkey % 5 AS rymax
    FROM nation
"""


SPARK = {
    "raster_as_features_mod": raster_as_features_mod,
    "raster_footprint_rect": raster_footprint_rect,
}
ORACLE = {
    "raster_as_features_mod": _FEAT_ORACLE,
    "raster_footprint_rect": _FP_ORACLE,
}


_GCP_SCH = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("i", T.IntegerType()),
        T.StructField("j", T.IntegerType()),
        T.StructField("v", T.IntegerType()),
        T.StructField("gt0", T.DoubleType()),
        T.StructField("gt1", T.DoubleType()),
        T.StructField("gt3", T.DoubleType()),
        T.StructField("gt5", T.DoubleType()),
    ]
)


def raster_warp_gcp_affine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gdalwarp -order 1 through the REAL GCP pipeline (gdal_crs.c
    least-squares fit -> suggested output grid -> inverse-map nearest
    gather) on GCPs sampled from an exact affine map
    gx = 2*px + 10 + k, gy = -2*py + 50: the order-1 fit reproduces the
    affine exactly, the output grid aligns 1:1 with the source, and
    every warped pixel equals its closed-form source value."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from gdal_spark.raster.gcp import warp_array_gcp

        for pdf in batches:
            rows = []
            for k in pdf["n_nationkey"]:
                k = int(k)
                src = _mod_raster(k)
                gcps = np.array(
                    [
                        (px, py, 2.0 * px + 10.0 + k, -2.0 * py + 50.0)
                        for px, py in
                        [(0, 0), (_N, 0), (0, _N), (_N, _N), (8, 4)]
                    ],
                    dtype=np.float64,
                )
                out, gt = warp_array_gcp(
                    src, gcps, method="poly1", resample="near", out_res=2.0
                )
                g = [round(gt[x], 4) for x in (0, 1, 3, 5)]
                for i in range(out.shape[0]):
                    for j in range(out.shape[1]):
                        rows.append((k, i, j, int(out[i, j]), *g))
            yield pd.DataFrame(rows, columns=[f.name for f in _GCP_SCH.fields])

    return _nation(spark, sf_dir).mapInPandas(run, _GCP_SCH)


_GCP_ORACLE = f"""
    WITH g AS (
        SELECT i.range AS i, j.range AS j
        FROM range({_N}) i CROSS JOIN range({_N}) j
    )
    SELECT n_nationkey AS k, CAST(i AS INT) AS i, CAST(j AS INT) AS j,
           CAST((i * 37 + j * 101 + n_nationkey * 13) % 97 AS INT) AS v,
           CAST(10.0 + n_nationkey AS DOUBLE) AS gt0, 2.0 AS gt1,
           50.0 AS gt3, -2.0 AS gt5
    FROM nation CROSS JOIN g
"""


SPARK["raster_warp_gcp_affine"] = raster_warp_gcp_affine
ORACLE["raster_warp_gcp_affine"] = _GCP_ORACLE


def raster_warp_homography(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gdalwarp with a TRUE projective homography (alg/gdal_homography.cpp)
    fitted from exact GCPs of X = (2px+10)/w, Y = (50-2py)/w, w = 1+0.001px:
    the >=4-GCP DLT reproduces the homography, the suggested grid derives
    from the projective border sample, and every warped pixel matches the
    closed-form rational inverse x = (X-10)/(2-0.001X), y = (50-Y·w)/2 that
    DuckDB recomputes. Rounding margin to the nearest-gather boundary is
    0.125 px, so no fp flip is possible."""

    def _h(px, py):
        w = 1.0 + 0.001 * px
        return (2.0 * px + 10.0) / w, (50.0 - 2.0 * py) / w

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from gdal_spark.raster.gcp import warp_array_gcp

        pts = [(0, 0), (16, 0), (0, 16), (16, 16), (8, 4), (4, 12)]
        gcps = np.array(
            [(px, py, *_h(px, py)) for px, py in pts], dtype=np.float64
        )
        for pdf in batches:
            rows = []
            for k in pdf["n_nationkey"]:
                k = int(k)
                out, gt = warp_array_gcp(
                    _mod_raster(k), gcps, method="homography",
                    resample="near", out_res=2.0,
                )
                g = [round(gt[x], 4) for x in (0, 1, 3, 5)]
                for i in range(out.shape[0]):
                    for j in range(out.shape[1]):
                        rows.append((k, i, j, int(out[i, j]), *g))
            yield pd.DataFrame(rows, columns=[f.name for f in _GCP_SCH.fields])

    return _nation(spark, sf_dir).mapInPandas(run, _GCP_SCH)


# exact grid constants of the suggested output (k-independent):
# xmin = 10, xmax = 42/1.016, ymax = 50, ymin = 18/1.016, 16x16 at the
# derived resolution
_HW_XMAX = 42.0 / 1.016
_HW_YMIN = 18.0 / 1.016
_HW_RESX = (_HW_XMAX - 10.0) / 16.0
_HW_RESY = (50.0 - _HW_YMIN) / 16.0

_HOMOG_ORACLE = f"""
    WITH g AS (
        SELECT i.range AS i, j.range AS j,
               10.0 + (j.range + 0.5) * {_HW_RESX!r} AS gx,
               50.0 - (i.range + 0.5) * {_HW_RESY!r} AS gy
        FROM range({_N}) i CROSS JOIN range({_N}) j
    ),
    s AS (
        SELECT i, j, (gx - 10.0) / (2.0 - 0.001 * gx) AS x, gy FROM g
    ),
    p AS (
        SELECT i, j,
               CAST(round(x - 0.5) AS BIGINT) AS ix,
               CAST(round((50.0 - gy * (1.0 + 0.001 * x)) / 2.0 - 0.5)
                    AS BIGINT) AS iy
        FROM s
    )
    SELECT n_nationkey AS k, CAST(i AS INT) AS i, CAST(j AS INT) AS j,
           CAST((least(greatest(iy, 0), {_N - 1}) * 37
                 + least(greatest(ix, 0), {_N - 1}) * 101
                 + n_nationkey * 13) % 97 AS INT) AS v,
           10.0 AS gt0, round({_HW_RESX!r}, 4) AS gt1,
           50.0 AS gt3, round(-{_HW_RESY!r}, 4) AS gt5
    FROM nation CROSS JOIN p
"""

SPARK["raster_warp_homography"] = raster_warp_homography
ORACLE["raster_warp_homography"] = _HOMOG_ORACLE


# --------------------------------------------------------------------------
# RPC (RPC00B) direct projection: lonlat+height -> pixel/line through the
# 20-term rational polynomial (alg/gdal_rpc.cpp RPCComputeTerms +
# RPCTransformPoint incl. the +0.5 center-to-corner shift), recomputed
# term-for-term by DuckDB from the same coefficients.
# --------------------------------------------------------------------------

_RPC_MD = {
    "LINE_OFF": "16201", "SAMP_OFF": "15184", "HEIGHT_OFF": "97",
    "LAT_OFF": "39.7792", "LONG_OFF": "125.7510",
    "LINE_SCALE": "16480", "SAMP_SCALE": "15217", "HEIGHT_SCALE": "501",
    "LAT_SCALE": "0.0900", "LONG_SCALE": "0.1096",
    "LINE_NUM_COEFF": (
        "+5.105608E-04 -2.921055E-02 -1.010407E+00 -1.743729E-02 "
        "-6.604239E-05 -7.871396E-05 +3.027877E-04 -4.323587E-04 "
        "-2.624751E-04 +6.186490E-06 +1.084676E-06 +5.389738E-05 "
        "+4.145232E-06 +3.911486E-07 +1.772434E-05 +3.302960E-06 "
        "+3.006106E-06 +1.662606E-05 +6.051677E-06 -2.657667E-08"
    ),
    "LINE_DEN_COEFF": (
        "+1.000000E+00 -9.652128E-05 +2.488346E-04 +3.089019E-04 "
        "-2.120170E-06 +4.117913E-07 +1.370009E-06 +1.357281E-05 "
        "-4.174324E-06 -3.146787E-06 -7.724587E-06 +3.524480E-04 "
        "-1.303224E-05 -8.507679E-07 -1.670972E-05 +6.781061E-06 "
        "+5.602262E-07 +1.161421E-05 +4.681872E-06 +5.593931E-08"
    ),
    "SAMP_NUM_COEFF": (
        "-2.429563E-04 +1.028320E+00 -3.360972E-02 +3.519600E-03 "
        "-6.568341E-04 +5.951139E-04 -3.875716E-04 +1.260622E-04 "
        "-5.273817E-05 -4.418981E-06 -3.520581E-06 -2.502760E-04 "
        "-4.167704E-05 -5.973233E-05 -1.438949E-04 +7.603041E-06 "
        "+2.358136E-06 -2.275274E-05 +1.602657E-06 -1.716541E-07"
    ),
    "SAMP_DEN_COEFF": (
        "+1.000000E+00 +7.765620E-05 +6.568707E-04 -6.270621E-04 "
        "+5.163170E-05 +6.979463E-06 +2.476334E-07 +1.083558E-04 "
        "-4.043734E-05 -5.819288E-05 +1.778201E-07 +5.665202E-05 "
        "+6.927205E-06 +6.793485E-07 +3.604209E-05 -4.057103E-07 "
        "-8.291254E-07 +1.010650E-05 -2.875552E-06 +5.142751E-08"
    ),
}

_RPC_SCH = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("px", T.DoubleType()),
        T.StructField("ln", T.DoubleType()),
    ]
)


def rpc_project_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from gdal_spark.raster.rpc import RPCInfo, rpc_transform_point

        rpc = RPCInfo(_RPC_MD)
        for pdf in batches:
            rows = []
            for k in pdf["n_nationkey"]:
                k = int(k)
                lon = 125.7510 + (k % 11 - 5) * 0.01
                lat = 39.7792 + (k % 7 - 3) * 0.008
                h = (k % 5) * 20.0
                px, ln = rpc_transform_point(rpc, lon, lat, h)
                rows.append((k, round(float(px), 4), round(float(ln), 4)))
            yield pd.DataFrame(rows, columns=[f.name for f in _RPC_SCH.fields])

    return _nation(spark, sf_dir).mapInPandas(run, _RPC_SCH)


def _rpc_poly_sql(coeff_key: str) -> str:
    terms = [
        "1", "L", "P", "H", "L*P", "L*H", "P*H", "L*L", "P*P", "H*H",
        "L*P*H", "L*L*L", "L*P*P", "L*H*H", "L*L*P", "P*P*P", "P*H*H",
        "L*L*H", "P*P*H", "H*H*H",
    ]
    coefs = [float(c) for c in _RPC_MD[coeff_key].split()]
    return " + ".join(f"({c!r})*{t}" for c, t in zip(coefs, terms))


_RPC_ORACLE = f"""
    WITH pt AS (
        SELECT n_nationkey AS k,
               (125.7510 + (n_nationkey % 11 - 5) * 0.01 - 125.7510)
                   / 0.1096 AS L,
               (39.7792 + (n_nationkey % 7 - 3) * 0.008 - 39.7792)
                   / 0.0900 AS P,
               ((n_nationkey % 5) * 20.0 - 97) / 501 AS H
        FROM nation
    )
    SELECT k,
           round(({_rpc_poly_sql("SAMP_NUM_COEFF")})
                 / ({_rpc_poly_sql("SAMP_DEN_COEFF")})
                 * 15217 + 15184 + 0.5, 4) AS px,
           round(({_rpc_poly_sql("LINE_NUM_COEFF")})
                 / ({_rpc_poly_sql("LINE_DEN_COEFF")})
                 * 16480 + 16201 + 0.5, 4) AS ln
    FROM pt
"""

SPARK["rpc_project_points"] = rpc_project_points
ORACLE["rpc_project_points"] = _RPC_ORACLE


# --------------------------------------------------------------------------
# Geolocation-array transformer (alg/gdalgeoloc.cpp): swath lon/lat node
# arrays built from a bilinear formula, so PixelLineToXY interpolation of
# the nodes equals the formula at fractional coordinates exactly, and the
# inverse quad search must return the original pixel. DuckDB recomputes
# the formula; the round trip is asserted against the inputs.
# --------------------------------------------------------------------------

_GL_POS = [(0.3, 0.7), (1.5, 1.2), (0.1, 1.9), (1.9, 0.1)]
_GL_SCH = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("pid", T.IntegerType()),
        T.StructField("geo_x", T.DoubleType()),
        T.StructField("geo_y", T.DoubleType()),
        T.StructField("px_rt", T.DoubleType()),
        T.StructField("py_rt", T.DoubleType()),
    ]
)


def geoloc_swath_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from gdal_spark.raster.geoloc import GeoLocTransformer

        for pdf in batches:
            rows = []
            for k in pdf["n_nationkey"]:
                k = int(k)
                yy, xx = np.mgrid[0:4, 0:4].astype(float)
                lon = 10.0 + xx + 0.1 * yy + 0.01 * k
                lat = 50.0 - yy + 0.05 * xx
                tr = GeoLocTransformer(lon, lat)
                for pid, (p, l_) in enumerate(_GL_POS):
                    X, Y = tr.pixel_to_geo(p, l_)
                    p2, l2 = tr.geo_to_pixel(X, Y)
                    rows.append(
                        (
                            k, pid, round(X, 4), round(Y, 4),
                            round(p2, 4), round(l2, 4),
                        )
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in _GL_SCH.fields])

    return _nation(spark, sf_dir).mapInPandas(run, _GL_SCH)


_GL_POS_SQL = ", ".join(
    f"({i}, {p!r}, {l_!r})" for i, (p, l_) in enumerate(_GL_POS)
)

_GEOLOC_ORACLE = f"""
    WITH pos(pid, p, l) AS (VALUES {_GL_POS_SQL})
    SELECT n_nationkey AS k, CAST(pid AS INT) AS pid,
           round(10.0 + p + 0.1 * l + 0.01 * n_nationkey, 4) AS geo_x,
           round(50.0 - l + 0.05 * p, 4) AS geo_y,
           round(p, 4) AS px_rt, round(l, 4) AS py_rt
    FROM nation CROSS JOIN pos
"""

SPARK["geoloc_swath_sample"] = geoloc_swath_sample
ORACLE["geoloc_swath_sample"] = _GEOLOC_ORACLE


# --------------------------------------------------------------------------
# Line-of-sight (alg/los.cpp GDALIsLineOfSightVisible): flat terrain with a
# full-height wall column -- the horizontal scan and the diagonal Bresenham
# walk both cross the wall at a known cell, so visibility and the terrain
# intersection are closed-form: blocked iff lerp(zA, zB, wx/15) < H.
# --------------------------------------------------------------------------

_LOS_SCH = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("ray", T.StringType()),
        T.StructField("visible", T.BooleanType()),
        T.StructField("ix", T.IntegerType()),
        T.StructField("iy", T.IntegerType()),
    ]
)


def los_wall_mod(spark: SparkSession, sf_dir: str) -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from gdal_spark.raster.los import is_line_of_sight_visible

        for pdf in batches:
            rows = []
            for k in pdf["n_nationkey"]:
                k = int(k)
                wall_h = 5.0 + (k % 5) * 3.0
                wx = 4 + (k % 8)
                za = 2.0 + (k % 3)
                zb = 10.0 + (k % 7)
                dem = np.zeros((16, 16))
                dem[:, wx] = wall_h
                vh, hx, hy = is_line_of_sight_visible(
                    dem, 0, 8, za, 15, 8, zb
                )
                vd, dx_, dy_ = is_line_of_sight_visible(
                    dem, 0, 0, za, 15, 15, zb
                )
                rows.append((k, "h", vh, hx, hy))
                rows.append((k, "d", vd, dx_, dy_))
            yield pd.DataFrame(rows, columns=[f.name for f in _LOS_SCH.fields])

    return _nation(spark, sf_dir).mapInPandas(run, _LOS_SCH)


_LOS_ORACLE = """
    WITH p AS (
        SELECT n_nationkey AS k,
               5.0 + (n_nationkey % 5) * 3.0 AS wall_h,
               4 + (n_nationkey % 8) AS wx,
               2.0 + (n_nationkey % 3) AS za,
               10.0 + (n_nationkey % 7) AS zb
        FROM nation
    ),
    v AS (
        SELECT k, wx,
               (za + (wx / 15.0) * (zb - za)) >= wall_h AS vis
        FROM p
    )
    SELECT k, ray, vis AS visible,
           CAST(CASE WHEN vis THEN -1 ELSE wx END AS INT) AS ix,
           CAST(CASE WHEN vis THEN -1
                     WHEN ray = 'h' THEN 8 ELSE wx END AS INT) AS iy
    FROM v CROSS JOIN (SELECT 'h' AS ray UNION ALL SELECT 'd') r
"""

SPARK["los_wall_mod"] = los_wall_mod
ORACLE["los_wall_mod"] = _LOS_ORACLE


# --------------------------------------------------------------------------
# Vertical shift grid (alg/gdalapplyverticalshiftgrid.cpp): the grid nodes
# carry a LINEAR function of geo coordinates, so bilinear resampling onto
# the source grid reproduces the function exactly and DuckDB recomputes
# shifted = src + (2 + 0.5*X + 0.25*Y + 0.1*k) in closed form.
# --------------------------------------------------------------------------

_VS_SCH = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("y", T.IntegerType()),
        T.StructField("x", T.IntegerType()),
        T.StructField("v", T.DoubleType()),
    ]
)


def vshift_linear_mod(spark: SparkSession, sf_dir: str) -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from gdal_spark.raster.vshift import apply_vertical_shift

        src_gt = [100.0, 2.0, 0.0, 50.0, 0.0, -2.0]
        ggt = [90.0, 10.0, 0.0, 60.0, 0.0, -10.0]
        ii, jj = np.meshgrid(np.arange(8), np.arange(8), indexing="xy")
        gx_geo = 90.0 + (ii + 0.5) * 10.0
        gy_geo = 60.0 - (jj + 0.5) * 10.0
        for pdf in batches:
            rows = []
            for k in pdf["n_nationkey"]:
                k = int(k)
                grid = 2.0 + 0.5 * gx_geo + 0.25 * gy_geo + 0.1 * k
                out = apply_vertical_shift(
                    _mod_raster(k).astype(np.float64), grid, src_gt, ggt,
                    resampling="bilinear", error_on_missing=True,
                    out_dtype=np.float64,
                )
                for y in range(_N):
                    for x in range(_N):
                        rows.append((k, y, x, round(float(out[y, x]), 4)))
            yield pd.DataFrame(rows, columns=[f.name for f in _VS_SCH.fields])

    return _nation(spark, sf_dir).mapInPandas(run, _VS_SCH)


_VSHIFT_ORACLE = f"""
    WITH g AS (
        SELECT n_nationkey AS k, y.range AS y, x.range AS x
        FROM nation CROSS JOIN range({_N}) y CROSS JOIN range({_N}) x
    )
    SELECT k, CAST(y AS INT) AS y, CAST(x AS INT) AS x,
           round((y * 37 + x * 101 + k * 13) % 97
                 + 2.0 + 0.5 * (100.0 + (x + 0.5) * 2.0)
                 + 0.25 * (50.0 - (y + 0.5) * 2.0) + 0.1 * k, 4) AS v
    FROM g
"""

SPARK["vshift_linear_mod"] = vshift_linear_mod
ORACLE["vshift_linear_mod"] = _VSHIFT_ORACLE


# --------------------------------------------------------------------------
# GNM network analysis (gnm/gnmgraph.cpp) at cluster shape: single-source
# shortest path by iterative DataFrame relaxation over a per-nation 6x6
# grid DAG (right/down edges, deterministic costs). DuckDB recomputes the
# distances with a recursive CTE (the DAG guarantees termination).
# --------------------------------------------------------------------------

_NET_N = 6


def network_sssp_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from gdal_spark.operators.network import sssp_bellman_ford

    n = _nation(spark, sf_dir).select(F.col("n_nationkey").alias("k"))
    yy = spark.range(_NET_N).select(F.col("id").alias("y"))
    xx = spark.range(_NET_N).select(F.col("id").alias("x"))
    cells = n.crossJoin(yy).crossJoin(xx)
    node = (F.col("y") * _NET_N + F.col("x")).cast("long")
    right = cells.filter(F.col("x") < _NET_N - 1).select(
        "k",
        node.alias("src"),
        (node + 1).alias("dst"),
        (1 + (F.col("x") + F.col("y") + F.col("k")) % 5)
        .cast("double")
        .alias("cost"),
    )
    down = cells.filter(F.col("y") < _NET_N - 1).select(
        "k",
        node.alias("src"),
        (node + _NET_N).alias("dst"),
        (2 + (F.col("x") * F.col("y") + F.col("k")) % 7)
        .cast("double")
        .alias("cost"),
    )
    edges = right.unionByName(down)
    out = sssp_bellman_ford(edges, start=0, max_iter=2 * _NET_N + 2)
    return out.select(
        "k", F.col("node").cast("long").alias("node"),
        F.round("dist", 4).alias("dist"),
    )


_NET_ORACLE = f"""
    WITH RECURSIVE cells AS (
        SELECT n_nationkey AS k, y.range AS y, x.range AS x
        FROM nation CROSS JOIN range({_NET_N}) y CROSS JOIN range({_NET_N}) x
    ),
    edges AS (
        SELECT k, y * {_NET_N} + x AS src, y * {_NET_N} + x + 1 AS dst,
               CAST(1 + (x + y + k) % 5 AS DOUBLE) AS cost
        FROM cells WHERE x < {_NET_N - 1}
        UNION ALL
        SELECT k, y * {_NET_N} + x, y * {_NET_N} + x + {_NET_N},
               CAST(2 + (x * y + k) % 7 AS DOUBLE)
        FROM cells WHERE y < {_NET_N - 1}
    ),
    r AS (
        SELECT n_nationkey AS k, CAST(0 AS BIGINT) AS node, CAST(0.0 AS DOUBLE) AS d
        FROM nation
        UNION ALL
        SELECT e.k, CAST(e.dst AS BIGINT), r.d + e.cost
        FROM r JOIN edges e ON e.k = r.k AND e.src = r.node
    )
    SELECT k, node, round(min(d), 4) AS dist
    FROM r GROUP BY k, node
"""

SPARK["network_sssp_grid"] = network_sssp_grid
ORACLE["network_sssp_grid"] = _NET_ORACLE


# --------------------------------------------------------------------------
# gdal raster update (apps/gdalalg_raster_update.cpp): same-resolution
# near-resample paste of a constant source patch into the mod-raster at a
# geotransform-derived window, then a bbox-limited overview refresh --
# both pure arithmetic for DuckDB.
# --------------------------------------------------------------------------

_UPD_SCH = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("y", T.IntegerType()),
        T.StructField("x", T.IntegerType()),
        T.StructField("v", T.IntegerType()),
        T.StructField("ovr", T.DoubleType()),
    ]
)


def raster_update_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from gdal_spark.raster.kernels import block_reduce
        from gdal_spark.raster.update import refresh_overviews, update_raster

        dst_gt = [100.0, 1.0, 0.0, 50.0, 0.0, -1.0]
        for pdf in batches:
            rows = []
            for k in pdf["n_nationkey"]:
                k = int(k)
                dst = _mod_raster(k).astype(np.uint8)
                fill = 90 + (k % 8)
                px, py = 4 + (k % 6), 3 + (k % 7)
                src = np.full((4, 4), fill, np.uint8)
                src_gt = [100.0 + px, 1.0, 0.0, 50.0 - py, 0.0, -1.0]
                stale = block_reduce(dst.astype(np.float64), 2, 2, "average")
                out, win = update_raster(dst, dst_gt, src, src_gt)
                ovr = refresh_overviews(out, [stale], win)[0]
                for y in range(_N):
                    for x in range(_N):
                        rows.append(
                            (
                                k, y, x, int(out[y, x]),
                                round(float(ovr[y // 2, x // 2]), 4),
                            )
                        )
            yield pd.DataFrame(rows, columns=[f.name for f in _UPD_SCH.fields])

    return _nation(spark, sf_dir).mapInPandas(run, _UPD_SCH)


_UPDATE_ORACLE = f"""
    WITH p AS (
        SELECT n_nationkey AS k,
               90 + (n_nationkey % 8) AS fill,
               4 + (n_nationkey % 6) AS px,
               3 + (n_nationkey % 7) AS py
        FROM nation
    ),
    g AS (
        SELECT k, fill, px, py, y.range AS y, x.range AS x,
               CASE WHEN x.range >= px AND x.range < px + 4
                         AND y.range >= py AND y.range < py + 4
                    THEN fill
                    ELSE (y.range * 37 + x.range * 101 + k * 13) % 97
               END AS v
        FROM p CROSS JOIN range({_N}) y CROSS JOIN range({_N}) x
    ),
    -- overview: stale average of the ORIGINAL dst outside the padded
    -- refresh bbox, fresh average of the UPDATED dst inside it
    o AS (
        SELECT k, y // 2 AS oy, x // 2 AS ox,
               avg(CAST((y * 37 + x * 101 + k * 13) % 97 AS DOUBLE))
                   AS stale,
               avg(CAST(v AS DOUBLE)) AS fresh,
               bool_or(x >= (px // 2) * 2 AND x < ((px + 4 + 1) // 2) * 2
                       AND y >= (py // 2) * 2
                       AND y < ((py + 4 + 1) // 2) * 2) AS in_bbox
        FROM g GROUP BY k, y // 2, x // 2
    )
    SELECT g.k, CAST(g.y AS INT) AS y, CAST(g.x AS INT) AS x,
           CAST(g.v AS INT) AS v,
           round(CASE WHEN o.in_bbox THEN o.fresh ELSE o.stale END, 4)
               AS ovr
    FROM g JOIN o ON o.k = g.k AND o.oy = g.y // 2 AND o.ox = g.x // 2
"""

SPARK["raster_update_window"] = raster_update_window
ORACLE["raster_update_window"] = _UPDATE_ORACLE


# --------------------------------------------------------------------------
# RPC_DEM direct projection (alg/gdal_rpc.cpp GDALRPCGetHeightAtLongLat
# :550-636 + GDALRPCTransform reverse branch :1928-1953): per-point height
# sampled from a WGS84 DEM by bilinear GDALInterpolateAtPoint, then the
# 20-term rational. The DEM is a LINEAR plane over its pixel grid, so the
# bilinear sample is closed-form and DuckDB recomputes the whole chain:
# height = RPC_HEIGHT + dem(lon, lat) * RPC_HEIGHT_SCALE.
# --------------------------------------------------------------------------

_RPCDEM_GT = (125.0, 0.01, 0.0, 40.5, 0.0, -0.01)  # 200x200 WGS84 DEM


def rpc_dem_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from gdal_spark.raster.rpc import RPCTransformer

        r = np.arange(200)
        dem = 30.0 + 0.5 * r[None, :] + 0.25 * r[:, None]
        tr = RPCTransformer(
            _RPC_MD, dem=dem, dem_gt=_RPCDEM_GT, rpc_height_scale=2.0
        )
        for pdf in batches:
            rows = []
            for k in pdf["n_nationkey"]:
                k = int(k)
                lon = 125.7510 + (k % 11 - 5) * 0.01
                lat = 39.7792 + (k % 7 - 3) * 0.008
                px, ln = tr.lonlat_to_pixel(lon, lat)
                rows.append((k, round(float(px), 4), round(float(ln), 4)))
            yield pd.DataFrame(rows, columns=[f.name for f in _RPC_SCH.fields])

    return _nation(spark, sf_dir).mapInPandas(run, _RPC_SCH)


# dem[r, c] = 30 + 0.5*c + 0.25*r; bilinear at fractional DEM pixel
# (dpx, dln) under the pixel-center convention == the plane at
# (dpx - 0.5, dln - 0.5). All sample points sit well inside the DEM.
_RPCDEM_H = """
    ((30 + 0.5*((lon - 125.0)/0.01 - 0.5)
         + 0.25*((40.5 - lat)/0.01 - 0.5)) * 2.0 - 97) / 501
"""

_RPCDEM_ORACLE = f"""
    WITH pt AS (
        SELECT n_nationkey AS k,
               125.7510 + (n_nationkey % 11 - 5) * 0.01 AS lon,
               39.7792 + (n_nationkey % 7 - 3) * 0.008 AS lat
        FROM nation
    ), nrm AS (
        SELECT k,
               (lon - 125.7510) / 0.1096 AS L,
               (lat - 39.7792) / 0.0900 AS P,
               {_RPCDEM_H} AS H
        FROM pt
    )
    SELECT k,
           round(({_rpc_poly_sql("SAMP_NUM_COEFF")})
                 / ({_rpc_poly_sql("SAMP_DEN_COEFF")})
                 * 15217 + 15184 + 0.5, 4) AS px,
           round(({_rpc_poly_sql("LINE_NUM_COEFF")})
                 / ({_rpc_poly_sql("LINE_DEN_COEFF")})
                 * 16480 + 16201 + 0.5, 4) AS ln
    FROM nrm
"""

SPARK["rpc_dem_project"] = rpc_dem_project
ORACLE["rpc_dem_project"] = _RPCDEM_ORACLE


# --------------------------------------------------------------------------
# RPC orthorectification (gdalwarp -rpc + RPC_DEM, alg/gdal_rpc.cpp direct
# path :1928-1953 through raster/gcp.py warp_array_rpc): mod-raster source,
# per-nation output windows, linear-plane WGS84 DEM heights. Every output
# pixel is closed-form: DuckDB recomputes lon/lat -> DEM height ->
# 20-term rational -> source pixel -> mod value.
# --------------------------------------------------------------------------

_ORTHO_SCH = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("y", T.IntegerType()),
        T.StructField("x", T.IntegerType()),
        T.StructField("v", T.IntegerType()),
    ]
)

_ORTHO_W, _ORTHO_H = 16, 12
_ORTHO_RES = 5e-6


def raster_warp_rpc(spark: SparkSession, sf_dir: str) -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from gdal_spark.raster.gcp import warp_array_rpc

        rng = np.arange(64)
        src = ((rng[:, None] * 37 + rng[None, :] * 101) % 97).astype(np.int32)
        r = np.arange(200)
        dem = 30.0 + 0.5 * r[None, :] + 0.25 * r[:, None]
        for pdf in batches:
            rows = []
            for k in pdf["n_nationkey"]:
                k = int(k)
                lon0 = 125.64800 + (k % 5) * 2e-5
                lat0 = 39.86950 - (k % 3) * 1.5e-5
                dst_gt = (lon0, _ORTHO_RES, 0.0, lat0, 0.0, -_ORTHO_RES)
                out, _ = warp_array_rpc(
                    src, _RPC_MD, resample="near", dst_gt=dst_gt,
                    out_size=(_ORTHO_W, _ORTHO_H), nodata=-1,
                    dem=dem, dem_gt=_RPCDEM_GT, rpc_height_scale=2.0,
                )
                for y in range(_ORTHO_H):
                    for x in range(_ORTHO_W):
                        rows.append((k, y, x, int(out[y, x])))
            yield pd.DataFrame(
                rows, columns=[f.name for f in _ORTHO_SCH.fields]
            )

    return _nation(spark, sf_dir).mapInPandas(run, _ORTHO_SCH)


_ORTHO_ORACLE = f"""
    WITH px AS (
        SELECT n_nationkey AS k, y, x,
               125.64800 + (n_nationkey % 5) * 2e-5
                   + (x + 0.5) * {_ORTHO_RES} AS lon,
               39.86950 - (n_nationkey % 3) * 1.5e-5
                   - (y + 0.5) * {_ORTHO_RES} AS lat
        FROM nation,
             generate_series(0, {_ORTHO_H - 1}) t1(y),
             generate_series(0, {_ORTHO_W - 1}) t2(x)
    ), nrm AS (
        SELECT k, y, x,
               (lon - 125.7510) / 0.1096 AS L,
               (lat - 39.7792) / 0.0900 AS P,
               {_RPCDEM_H} AS H
        FROM px
    ), sp AS (
        SELECT k, y, x,
               ({_rpc_poly_sql("SAMP_NUM_COEFF")})
                   / ({_rpc_poly_sql("SAMP_DEN_COEFF")})
                   * 15217 + 15184 + 0.5 - 0.5 AS s,
               ({_rpc_poly_sql("LINE_NUM_COEFF")})
                   / ({_rpc_poly_sql("LINE_DEN_COEFF")})
                   * 16480 + 16201 + 0.5 - 0.5 AS t
        FROM nrm
    )
    SELECT k, CAST(y AS INT) AS y, CAST(x AS INT) AS x,
           CAST(CASE WHEN s >= -0.5 AND s <= 63.5 AND t >= -0.5 AND t <= 63.5
                THEN CAST((least(greatest(round(t), 0), 63) * 37
                     + least(greatest(round(s), 0), 63) * 101) AS BIGINT) % 97
                ELSE -1 END AS INT) AS v
    FROM sp
"""

SPARK["raster_warp_rpc"] = raster_warp_rpc
ORACLE["raster_warp_rpc"] = _ORTHO_ORACLE


# --------------------------------------------------------------------------
# nearblack / gdal raster clean-collar (apps/nearblack_lib.cpp two-passes
# algorithm through raster/collar.py): per-nation 64x64 rasters with a
# rectangular near-black frame around a non-near-black interior. With
# maxNonBlack=0 the erosion removes exactly the frame, so the output and
# mask are closed-form; DuckDB recomputes per-(k, y) row sums.
# --------------------------------------------------------------------------

_COLLAR_SCH = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("y", T.IntegerType()),
        T.StructField("row_sum", T.LongType()),
        T.StructField("row_valid", T.LongType()),
    ]
)


def raster_clean_collar(spark: SparkSession, sf_dir: str) -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from gdal_spark.raster.collar import nearblack

        yy, xx = np.mgrid[0:64, 0:64]
        for pdf in batches:
            rows = []
            for k in pdf["n_nationkey"]:
                k = int(k)
                t, b = 2 + k % 3, 1 + k % 4
                l_, r_ = 3 + k % 5, 2 + k % 2
                inside = (
                    (yy >= t) & (yy < 64 - b) & (xx >= l_) & (xx < 64 - r_)
                )
                v = np.where(
                    inside, 20 + (yy * 7 + xx * 11 + k) % 50,
                    (yy + xx + k) % 12,
                ).astype(np.uint8)
                out, mask = nearblack(v, max_non_black=0, set_mask=True)
                for y in range(64):
                    rows.append(
                        (
                            k, y,
                            int(out[y].astype(np.int64).sum()),
                            int((mask[y] == 255).sum()),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in _COLLAR_SCH.fields]
            )

    return _nation(spark, sf_dir).mapInPandas(run, _COLLAR_SCH)


_COLLAR_ORACLE = """
    WITH px AS (
        SELECT n_nationkey AS k, y, x,
               CASE WHEN y >= 2 + n_nationkey % 3
                     AND y < 64 - (1 + n_nationkey % 4)
                     AND x >= 3 + n_nationkey % 5
                     AND x < 64 - (2 + n_nationkey % 2)
                    THEN 1 ELSE 0 END AS inside,
               20 + (y*7 + x*11 + n_nationkey) % 50 AS v
        FROM nation,
             generate_series(0, 63) t1(y),
             generate_series(0, 63) t2(x)
    )
    SELECT k, CAST(y AS INT) AS y,
           CAST(sum(inside * v) AS BIGINT) AS row_sum,
           CAST(sum(inside) AS BIGINT) AS row_valid
    FROM px GROUP BY k, y
"""

SPARK["raster_clean_collar"] = raster_clean_collar
ORACLE["raster_clean_collar"] = _COLLAR_ORACLE


# --------------------------------------------------------------------------
# gdal raster compare (apps/gdalalg_raster_compare.cpp): two PNG image
# tables joined on image_id, per-band differing-pixel counts + max abs
# difference. Raster B plants (y*31+x*17+k)%23==0 bumps of 1+k%5 onto the
# mod raster, so both statistics are closed-form for DuckDB.
# --------------------------------------------------------------------------


def _compare_images_pair(spark: SparkSession, sf_dir: str):
    sch = T.StructType(
        [
            T.StructField("image_id", T.StringType()),
            T.StructField("bytes", T.BinaryType()),
            T.StructField("fmt", T.StringType()),
        ]
    )

    def build(planted: bool):
        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from gdal_spark.functions import codecs

            yy, xx = np.mgrid[0:32, 0:32]
            for pdf in batches:
                rows = []
                for k in pdf["n_nationkey"]:
                    k = int(k)
                    v = ((yy * 37 + xx * 101 + k * 13) % 97).astype(np.uint8)
                    if planted:
                        bump = ((yy * 31 + xx * 17 + k) % 23 == 0)
                        v = (v + bump * (1 + k % 5)).astype(np.uint8)
                    rows.append(
                        (f"img{k:04d}", bytearray(codecs.encode_image(v, "png")), "png")
                    )
                yield pd.DataFrame(rows, columns=["image_id", "bytes", "fmt"])

        return _nation(spark, sf_dir).mapInPandas(run, sch)

    return build(False), build(True)


def raster_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.raster import ops

    a, b = _compare_images_pair(spark, sf_dir)
    return ops.compare_images(a, b)


# the engine PNG codec stores grayscale as RGB, so 3 identical bands
_COMPARE_ORACLE = """
    SELECT 'img' || lpad(CAST(n_nationkey AS VARCHAR), 4, '0') AS image_id,
           CAST(band AS INT) AS band,
           CAST(sum(CASE WHEN (y*31 + x*17 + n_nationkey) % 23 = 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_diff,
           CAST(1 + n_nationkey % 5 AS DOUBLE) AS max_abs_diff
    FROM nation,
         generate_series(0, 31) t1(y),
         generate_series(0, 31) t2(x),
         generate_series(1, 3) t3(band)
    GROUP BY n_nationkey, band
"""

SPARK["raster_compare"] = raster_compare
ORACLE["raster_compare"] = _COMPARE_ORACLE
