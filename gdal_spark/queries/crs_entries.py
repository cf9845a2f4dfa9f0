"""CRS contract queries: UTM (Transverse Mercator, Krueger series).

The oracle re-evaluates the SAME published 6th-order series in DuckDB SQL
(sinh/cosh/atanh composed from exp/ln) — an independent engine computing
the same public formulas, so the value-hash gate checks the whole numeric
path. Reference: GDAL warps UTM sources via PROJ (ogr/ogrct.cpp:1788);
its own warp benchmark is EPSG:32631 -> 4326
(autotest/benchmark/test_gdalwarp.py:24).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gdal_spark.functions import crs
from gdal_spark.sources.tables import load

_UTM_SCHEMA = T.StructType(
    [T.StructField("e", T.DoubleType()), T.StructField("n", T.DoubleType())]
)


@F.pandas_udf(_UTM_SCHEMA)
def _utm31_udf(lon: pd.Series, lat: pd.Series) -> pd.DataFrame:
    e, n = crs.utm_forward(lon.to_numpy(), lat.to_numpy(), "EPSG:32631")
    return pd.DataFrame({"e": e, "n": n})


def _lonlat_31(key):
    """Deterministic zone-31 test points from an integer key column."""
    lon = 0.2 + (key.cast("double") * 0.0137) % 5.6
    lat = -75.0 + (key.cast("double") * 1.618) % 155.0
    return lon, lat


def utm_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EPSG:4326 -> EPSG:32631 (UTM 31N) forward transform, Arrow-batched
    Krueger series (functions/crs.py), with machine-precision round-trip
    flags. Kilometre units keep the 4-decimal value-hash comparison well
    inside double agreement between engines."""
    e = load(spark, sf_dir, "events").filter(F.col("event_id") < 200)
    lon, lat = _lonlat_31(F.col("event_id"))
    pts = e.select("event_id", lon.alias("lon"), lat.alias("lat"))
    utm = pts.withColumn("utm", _utm31_udf(F.col("lon"), F.col("lat")))

    @F.pandas_udf(T.BooleanType())
    def rt_ok(ev: pd.Series, nv: pd.Series, lonv: pd.Series, latv: pd.Series) -> pd.Series:
        ilon, ilat = crs.utm_inverse(ev.to_numpy(), nv.to_numpy(), "EPSG:32631")
        return pd.Series(
            (abs(ilon - lonv.to_numpy()) < 1e-9) & (abs(ilat - latv.to_numpy()) < 1e-9)
        )

    return utm.select(
        "event_id",
        F.round(F.col("utm.e") / 1000.0, 4).alias("east_km"),
        F.round(F.col("utm.n") / 1000.0, 4).alias("north_km"),
        rt_ok(F.col("utm.e"), F.col("utm.n"), F.col("lon"), F.col("lat")).alias("rt_ok"),
    )


def _utm_oracle() -> str:
    """The same Krueger forward series as a DuckDB SQL expression —
    coefficients formatted at full double precision from crs.py."""
    c = repr(crs._E2SN)
    k0a = repr(crs._K0 * crs._ABAR)
    a1, a2, a3, a4, a5, a6 = (repr(v) for v in crs._ALPHA)
    return f"""
WITH pts AS (
  SELECT event_id,
         0.2 + fmod(event_id * 0.0137, 5.6) AS lon,
         -75.0 + fmod(event_id * 1.618, 155.0) AS lat
  FROM events WHERE event_id < 200
),
s1 AS (
  SELECT event_id, sin(radians(lat)) AS s, radians(lon - 3.0) AS lam FROM pts
),
s2 AS (
  SELECT event_id, lam,
         0.5*ln((1.0+s)/(1.0-s)) - {c} * 0.5*ln((1.0+{c}*s)/(1.0-{c}*s)) AS q
  FROM s1
),
s3 AS (
  SELECT event_id, lam, (exp(q) - exp(-q)) / 2.0 AS t FROM s2
),
s4 AS (
  SELECT event_id,
         atan2(t, cos(lam)) AS xip,
         ln(sin(lam)/sqrt(t*t + cos(lam)*cos(lam))
            + sqrt(sin(lam)*sin(lam)/(t*t + cos(lam)*cos(lam)) + 1.0)) AS etap
  FROM s3
),
s5 AS (
  SELECT event_id,
         xip + {a1}*sin(2*xip)*(exp(2*etap)+exp(-2*etap))/2.0
             + {a2}*sin(4*xip)*(exp(4*etap)+exp(-4*etap))/2.0
             + {a3}*sin(6*xip)*(exp(6*etap)+exp(-6*etap))/2.0
             + {a4}*sin(8*xip)*(exp(8*etap)+exp(-8*etap))/2.0
             + {a5}*sin(10*xip)*(exp(10*etap)+exp(-10*etap))/2.0
             + {a6}*sin(12*xip)*(exp(12*etap)+exp(-12*etap))/2.0 AS xi,
         etap + {a1}*cos(2*xip)*(exp(2*etap)-exp(-2*etap))/2.0
              + {a2}*cos(4*xip)*(exp(4*etap)-exp(-4*etap))/2.0
              + {a3}*cos(6*xip)*(exp(6*etap)-exp(-6*etap))/2.0
              + {a4}*cos(8*xip)*(exp(8*etap)-exp(-8*etap))/2.0
              + {a5}*cos(10*xip)*(exp(10*etap)-exp(-10*etap))/2.0
              + {a6}*cos(12*xip)*(exp(12*etap)-exp(-12*etap))/2.0 AS eta
  FROM s4
)
SELECT event_id,
       round((500000.0 + {k0a} * eta) / 1000.0, 4) AS east_km,
       round(({k0a} * xi) / 1000.0, 4) AS north_km,
       true AS rt_ok
FROM s5
"""


def raster_warp_utm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's own warp benchmark shape: EPSG:32631 -> EPSG:4326
    (autotest/benchmark/test_gdalwarp.py:24).  Each image is georeferenced
    as a 10 m UTM-31N tile near the zone meridian, warped with the
    approx-transformer + bilinear kernel onto a SuggestedWarpOutput grid.
    Self-check: the dst grid's corner maps back to the src corner through
    the inverse series at machine precision (rt_ok)."""
    from collections.abc import Iterator

    schema = T.StructType(
        [
            T.StructField("image_id", T.StringType()),
            T.StructField("out_w", T.IntegerType()),
            T.StructField("out_h", T.IntegerType()),
            T.StructField("lon0", T.DoubleType()),
            T.StructField("lat0", T.DoubleType()),
            T.StructField("cks", T.IntegerType()),
            T.StructField("valid_frac", T.DoubleType()),
            T.StructField("rt_ok", T.BooleanType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from gdal_spark.functions import checksum as CK
        from gdal_spark.functions import codecs
        from gdal_spark.raster import warp

        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                arr = codecs.decode_image(bytes(r.bytes), r.fmt)
                h, w = arr.shape[:2]
                k = int(r.image_id[3:11])
                src_gt = (
                    400000.0 + (k % 50) * 1000.0, 10.0, 0.0,
                    5400000.0 - (k % 30) * 1000.0, 0.0, -10.0,
                )
                def fwd(x, y):
                    return crs.transform("EPSG:32631", "EPSG:4326", x, y)
                dst_gt, out_w, out_h = warp.suggested_output_grid(
                    src_gt, w, h, fwd
                )
                out, mask = warp.warp_array(
                    arr, src_gt, dst_gt, out_h, out_w,
                    src_crs="EPSG:32631", dst_crs="EPSG:4326",
                    resample="bilinear", return_mask=True,
                )
                # inverse round-trip of the dst origin corner
                ex, ny = crs.transform(
                    "EPSG:4326", "EPSG:32631",
                    np.array([dst_gt[0]]), np.array([dst_gt[3]]))
                lon2, lat2 = fwd(ex, ny)
                rt = bool(
                    abs(lon2[0] - dst_gt[0]) < 1e-9
                    and abs(lat2[0] - dst_gt[3]) < 1e-9
                )
                band = out[:, :, 0] if out.ndim == 3 else out
                rows.append(
                    (
                        r.image_id, out_w, out_h,
                        round(dst_gt[0], 6), round(dst_gt[3], 6),
                        int(CK.checksum(band)),
                        round(float(mask.mean()), 4), rt,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "image_id", "out_w", "out_h", "lon0", "lat0",
                    "cks", "valid_frac", "rt_ok",
                ],
            )

    from gdal_spark import datagen

    imgs = datagen.images_df(spark, 24, with_pixels=True, size_cap=64)
    return imgs.mapInPandas(run, schema).orderBy("image_id")


def raster_warp_gcp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gdalwarp -order 3 / -tps: each image is georeferenced by a 5x5
    lattice of GCPs sampled from a smooth non-affine map (no
    geotransform at all — the GCP model IS the georeferencing, as for
    raw scanned/satellite imagery; alg/gdal_crs.c,
    alg/thinplatespline.cpp). Warped twice (polynomial order 3 and TPS)
    onto each model's suggested grid; model_ok checks both fitted
    models against the exact generating map at off-GCP probe points
    (<0.05 px) — the per-row invariant that the fit, not luck, produced
    the pixels."""
    from collections.abc import Iterator

    schema = T.StructType(
        [
            T.StructField("image_id", T.StringType()),
            T.StructField("poly_w", T.IntegerType()),
            T.StructField("poly_h", T.IntegerType()),
            T.StructField("cks_poly", T.IntegerType()),
            T.StructField("cks_tps", T.IntegerType()),
            T.StructField("model_ok", T.BooleanType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from gdal_spark.functions import checksum as CK
        from gdal_spark.functions import codecs
        from gdal_spark.raster import gcp as G

        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                arr = codecs.decode_image(bytes(r.bytes), r.fmt)
                if arr.ndim == 3:
                    arr = arr[:, :, 0]
                h, w = arr.shape
                k = int(r.image_id[3:11])

                def fwd(px, py):
                    gx = 1000.0 + (k % 7) * 50.0 + px * 3.0 + 0.4 * np.sin(py / 11.0)
                    gy = 2000.0 - py * 3.0 + 0.3 * np.cos(px / 13.0)
                    return gx, gy

                gx5, gy5 = np.meshgrid(np.linspace(0, w, 5), np.linspace(0, h, 5))
                ggx, ggy = fwd(gx5.ravel(), gy5.ravel())
                gcps = np.stack([gx5.ravel(), gy5.ravel(), ggx, ggy], axis=1)
                out_p, _ = G.warp_array_gcp(
                    arr.astype(np.float64), gcps, "poly3", resample="bilinear"
                )
                out_t, _ = G.warp_array_gcp(
                    arr.astype(np.float64), gcps, "tps", resample="bilinear"
                )
                qx = np.linspace(3, w - 3, 9)
                qy = np.linspace(3, h - 3, 9)
                ex, ey = fwd(qx, qy)
                ok = True
                for m in ("poly3", "tps"):
                    tr = G.GCPTransformer(gcps, m)
                    mx, my = tr.pixel_to_geo(qx, qy)
                    # geo residual over the 3.0 units/px map scale -> px
                    ok &= bool(np.max(np.hypot(mx - ex, my - ey)) / 3.0 < 0.05)
                rows.append(
                    (
                        r.image_id, out_p.shape[1], out_p.shape[0],
                        int(CK.checksum(out_p)), int(CK.checksum(out_t)), ok,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["image_id", "poly_w", "poly_h", "cks_poly", "cks_tps", "model_ok"],
            )

    from gdal_spark import datagen

    imgs = datagen.images_df(spark, 24, with_pixels=True, size_cap=64)
    return imgs.mapInPandas(run, schema).orderBy("image_id")


_LCC_SCHEMA = T.StructType(
    [T.StructField("e", T.DoubleType()), T.StructField("n", T.DoubleType())]
)


@F.pandas_udf(_LCC_SCHEMA)
def _l93_udf(lon: pd.Series, lat: pd.Series) -> pd.DataFrame:
    x, y = crs.transform("EPSG:4326", "EPSG:2154", lon.to_numpy(), lat.to_numpy())
    return pd.DataFrame({"e": x, "n": y})


def _lonlat_fr(key):
    """Deterministic points in the Lambert-93 domain (metropolitan France)."""
    lon = -4.5 + (key.cast("double") * 0.0173) % 13.0
    lat = 41.5 + (key.cast("double") * 0.923) % 9.5
    return lon, lat


def lcc_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EPSG:4326 -> EPSG:2154 (RGF93 / Lambert-93, LCC-2SP): the
    vectorized ellipsoidal conic forward (functions/crs.py _LCC2SP,
    EPSG Guidance Note 7-2 §3.1.1.1). The DuckDB oracle evaluates the
    identical closed-form t/rho/theta expressions — an independent
    engine re-deriving every coefficient, so the hash gate covers the
    full numeric path."""
    e = load(spark, sf_dir, "events").filter(F.col("event_id") < 200)
    lon, lat = _lonlat_fr(F.col("event_id"))
    pts = e.select("event_id", lon.alias("lon"), lat.alias("lat"))
    out = pts.withColumn("l93", _l93_udf(F.col("lon"), F.col("lat")))
    return out.select(
        "event_id",
        F.round(F.col("l93.e") / 1000.0, 4).alias("east_km"),
        F.round(F.col("l93.n") / 1000.0, 4).alias("north_km"),
    )


def _lcc_oracle() -> str:
    p = crs._PROJECTIONS["EPSG:2154"]
    e_, n_, aF = repr(p.e), repr(p.n), repr(p.a * p.F)
    rho0, fe, fn, lon0 = repr(float(p.rho0)), repr(p.fe), repr(p.fn), repr(p.lon0)
    return f"""
WITH pts AS (
  SELECT event_id,
         -4.5 + fmod(event_id * 0.0173, 13.0) AS lon,
         41.5 + fmod(event_id * 0.923, 9.5) AS lat
  FROM events WHERE event_id < 200
),
s1 AS (
  SELECT event_id,
         tan(pi()/4.0 - radians(lat)/2.0)
           / pow((1.0 - {e_} * sin(radians(lat))) / (1.0 + {e_} * sin(radians(lat))), {e_}/2.0) AS t,
         {n_} * radians(lon - {lon0}) AS th
  FROM pts
),
s2 AS (
  SELECT event_id, {aF} * pow(t, {n_}) AS rho, th FROM s1
)
SELECT event_id,
       round(({fe} + rho * sin(th)) / 1000.0, 4) AS east_km,
       round(({fn} + {rho0} - rho * cos(th)) / 1000.0, 4) AS north_km
FROM s2
"""


_R_SIN = 6371007.181
_T_SIN = 1111950.519667  # MODIS tile size in meters (2400 x 463.3127m cells)


def sinusoidal_modis_tile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MODIS SIN grid addressing: lon/lat -> sinusoidal meters -> (h, v)
    tile indices (the standard 36x18 tiling of the MODIS land products)
    with per-tile point counts. The projection is pure Column math
    (spherical sinusoidal: x = R*lam*cos(phi), y = R*phi) — whole-stage
    codegen, no UDF; the oracle mirrors it symbolically."""
    ev = load(spark, sf_dir, "events")
    lon = -180.0 + (F.col("event_id").cast("double") * 0.7177) % 360.0
    lat = -60.0 + (F.col("event_id").cast("double") * 0.3923) % 120.0
    x = F.lit(_R_SIN) * F.radians(lon) * F.cos(F.radians(lat))
    y = F.lit(_R_SIN) * F.radians(lat)
    h = F.floor((x + F.lit(18.0 * _T_SIN)) / F.lit(_T_SIN)).cast("int")
    v = F.floor((F.lit(9.0 * _T_SIN) - y) / F.lit(_T_SIN)).cast("int")
    return (
        ev.select(h.alias("h"), v.alias("v"))
        .groupBy("h", "v")
        .agg(F.count(F.lit(1)).alias("n_pts"))
        .filter(F.col("n_pts") >= 3)
    )


_SIN_ORACLE = f"""
WITH pts AS (
  SELECT -180.0 + fmod(event_id * 0.7177, 360.0) AS lon,
         -60.0 + fmod(event_id * 0.3923, 120.0) AS lat
  FROM events
),
xy AS (
  SELECT {_R_SIN!r} * radians(lon) * cos(radians(lat)) AS x,
         {_R_SIN!r} * radians(lat) AS y
  FROM pts
)
SELECT CAST(floor((x + 18.0 * {_T_SIN!r}) / {_T_SIN!r}) AS INT) AS h,
       CAST(floor((9.0 * {_T_SIN!r} - y) / {_T_SIN!r}) AS INT) AS v,
       count(*) AS n_pts
FROM xy GROUP BY h, v HAVING count(*) >= 3
"""


# --------------------------------------------------------------------------
# Horizontal datum shift: NAD27 -> WGS84 through an NTv2-style grid
# (PROJ hgridshift step, ogr/ogrct.cpp:1788 picks the NADCON/NTv2 grid
# operation; grid I/O parity in raster/shiftgrids.py).  The shift field
# is LINEAR in lon/lat, so bilinear node interpolation reproduces it
# exactly and DuckDB states the closed form; the inv_* columns assert
# the iterative inverse returns to the source to < 1e-6 arc-seconds.
# --------------------------------------------------------------------------

_DS_SCHEMA = T.StructType([
    T.StructField("k", T.IntegerType()),
    T.StructField("lon27", T.DoubleType()),
    T.StructField("lat27", T.DoubleType()),
    T.StructField("dlon_sec", T.DoubleType()),
    T.StructField("dlat_sec", T.DoubleType()),
    T.StructField("inv_err_sec", T.DoubleType()),
])

_DS_GRID = "nad27_synth_linear"


def _ds_register():
    """Deterministic float64 linear grid, lon [-110,-90] lat [25,45]."""
    import numpy as np

    from gdal_spark.functions import datumshift as DS

    if _DS_GRID in DS._REGISTRY:
        return
    h, w = 21, 21
    gt = (-110.5, 1.0, 0.0, 45.5, 0.0, -1.0)
    lon_c = gt[0] + (np.arange(w) + 0.5) * gt[1]
    lat_c = gt[3] + (np.arange(h) + 0.5) * gt[5]
    LON, LAT = np.meshgrid(lon_c, lat_c)
    dlat = 0.5 + 0.01 * LON + 0.02 * LAT
    dlon = -1.2 + 0.03 * LON - 0.015 * LAT
    arr = np.stack([dlat, dlon, np.zeros_like(dlat), np.zeros_like(dlat)],
                   axis=-1)
    DS.register_grid(_DS_GRID, arr, gt)


def datum_shift_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NAD27 -> WGS84 grid shift over deterministic CONUS points from
    nation keys, via the full ProjCRS(+nadgrids) pipeline; emits the
    applied shift in arc-seconds plus the inverse round-trip error."""
    from collections.abc import Iterator

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from gdal_spark.functions.crs import ProjCRS

        _ds_register()
        crs27 = ProjCRS(f"+proj=longlat +datum=NAD27 +nadgrids={_DS_GRID}")
        for pdf in batches:
            k = pdf["n_nationkey"].to_numpy(np.int64)
            lon27 = -110.0 + (k * 0.37) % 20.0
            lat27 = 25.5 + (k * 0.53) % 19.0
            lon84, lat84 = crs27.to_wgs84(lon27, lat27)
            rlon, rlat = crs27.from_wgs84(lon84, lat84)
            inv = np.maximum(np.abs(rlon - lon27), np.abs(rlat - lat27))
            yield pd.DataFrame({
                "k": k.astype(np.int32),
                "lon27": np.round(lon27, 6),
                "lat27": np.round(lat27, 6),
                "dlon_sec": np.round((lon27 - lon84) * 3600.0, 6),
                "dlat_sec": np.round((lat84 - lat27) * 3600.0, 6),
                "inv_err_sec": np.round(inv * 3600.0, 6),
            })

    return (
        load(spark, sf_dir, "nation")
        .select("n_nationkey")
        .mapInPandas(run, _DS_SCHEMA)
    )


_DS_ORACLE = """
WITH pts AS (
  SELECT CAST(n_nationkey AS INT) AS k,
         -110.0 + fmod(n_nationkey * 0.37, 20.0) AS lon,
         25.5 + fmod(n_nationkey * 0.53, 19.0) AS lat
  FROM nation
)
SELECT k,
       round(lon, 6) AS lon27,
       round(lat, 6) AS lat27,
       round(-1.2 + 0.03 * lon - 0.015 * lat, 6) AS dlon_sec,
       round(0.5 + 0.01 * lon + 0.02 * lat, 6) AS dlat_sec,
       0.0 AS inv_err_sec
FROM pts
"""


SPARK = {
    "utm_transform": utm_transform,
    "raster_warp_utm": raster_warp_utm,
    "raster_warp_gcp": raster_warp_gcp,
    "lcc_transform": lcc_transform,
    "sinusoidal_modis_tile": sinusoidal_modis_tile,
    "datum_shift_transform": datum_shift_transform,
}
ORACLE = {
    "utm_transform": _utm_oracle(),
    "lcc_transform": _lcc_oracle(),
    "sinusoidal_modis_tile": _SIN_ORACLE,
    "datum_shift_transform": _DS_ORACLE,
}
