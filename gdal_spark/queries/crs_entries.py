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


SPARK = {
    "utm_transform": utm_transform,
    "raster_warp_utm": raster_warp_utm,
    "raster_warp_gcp": raster_warp_gcp,
}
ORACLE = {"utm_transform": _utm_oracle()}
