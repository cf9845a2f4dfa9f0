"""Driver-contract entries for the morphological/focal operator family
(proximity, sieve, fillnodata, focal neighbors, pansharpen, footprint,
point interpolation).

Rows-only driver checks (pixel kernels aren't DuckDB-expressible); exact
correctness is pinned by tests/test_morph.py brute-force oracles, and the
entries below emit GDAL checksums (alg/gdalchecksum.cpp:48 semantics via
gdal_spark.functions.checksum) so regressions change visible values.

Scale shape: every operator is a NARROW per-image map (mapInPandas,
partition-local decode -> numpy kernel -> stats). No shuffle except the
final tiny checksum collect — at 100 TB the plan is a single scan stage.
point_interpolate is a broadcast join of a small point set against the
image partition stream.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gdal_spark import datagen

N = 24
CAP = 64

_STAT_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("cks", T.IntegerType()),
        T.StructField("vmin", T.DoubleType()),
        T.StructField("vmax", T.DoubleType()),
        T.StructField("vmean", T.DoubleType()),
    ]
)


def _imgs(spark: SparkSession, n: int = N) -> DataFrame:
    return datagen.images_df(spark, n, with_pixels=True, size_cap=CAP)


def _stat_entry(kernel_fn):
    """Lift arr(float gray) -> arr kernel into (image_id, cks, min/max/mean)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from gdal_spark.functions import checksum as CK
        from gdal_spark.functions import codecs

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = codecs.decode_image(r.bytes, r.fmt)
                gray = 0.299 * arr[:, :, 0] + 0.587 * arr[:, :, 1] + 0.114 * arr[:, :, 2]
                out = np.asarray(kernel_fn(gray), dtype=np.float64)
                q = np.clip(np.round(out), 0, 255).astype(np.uint8)
                rows.append(
                    (
                        r.image_id,
                        int(CK.checksum(q)),
                        float(out.min()),
                        float(out.max()),
                        float(out.mean()),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in _STAT_SCHEMA.fields])

    return run


def raster_proximity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distance-to-bright-pixels (GDALComputeProximity semantics,
    alg/gdalproximity.cpp:94; exact EDT kernel)."""
    from gdal_spark.raster import morph

    def fn(gray):
        # explicit nodata=cap: keeps the stat band bounded (GDAL default
        # nodata is 65535.0 beyond MAXDIST)
        return morph.proximity(gray > 200, max_dist=50.0, nodata=50.0)

    return _imgs(spark).mapInPandas(_stat_entry(fn), _STAT_SCHEMA)


def raster_sieve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-component removal (GDALSieveFilter,
    alg/gdalsievefilter.cpp:178) on a 4-level quantized band."""
    from gdal_spark.raster import morph

    def fn(gray):
        quant = (gray // 64).astype(np.int64)
        return morph.sieve(quant, threshold=8) * 64

    return _imgs(spark).mapInPandas(_stat_entry(fn), _STAT_SCHEMA)


def raster_fillnodata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Punch a deterministic hole pattern, refill by IDW
    (GDALFillNodata semantics, alg/rasterfill.cpp:394)."""
    from gdal_spark.raster import morph

    def fn(gray):
        h, w = gray.shape
        yy, xx = np.mgrid[0:h, 0:w]
        valid = ((xx // 4) + (yy // 4)) % 3 != 0
        return morph.fillnodata(np.where(valid, gray, 0.0), valid, max_search_dist=16)

    return _imgs(spark).mapInPandas(_stat_entry(fn), _STAT_SCHEMA)


def raster_focal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5x5 focal median (`gdal raster neighbors`,
    apps/gdalalg_raster_neighbors.cpp:207)."""
    from gdal_spark.raster import morph

    def fn(gray):
        return morph.focal_stat(gray, size=5, method="median")

    return _imgs(spark).mapInPandas(_stat_entry(fn), _STAT_SCHEMA)


def raster_convolve_sharpen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named sharpen kernel (apps/gdalalg_raster_neighbors.cpp:34-58)."""
    from gdal_spark.raster import morph

    def fn(gray):
        return morph.convolve(gray, "sharpen")

    return _imgs(spark).mapInPandas(_stat_entry(fn), _STAT_SCHEMA)


def raster_pansharpen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted-Brovey fusion: pan = synthetic half-res upsample
    (alg/gdalpansharpen.cpp:592)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from gdal_spark.functions import checksum as CK
        from gdal_spark.functions import codecs
        from gdal_spark.raster import kernels as K
        from gdal_spark.raster import morph

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = codecs.decode_image(r.bytes, r.fmt).astype(np.float64)
                # simulate low-res MS: 2x down + 2x up, pan = original luma
                ms = K.resample_bilinear(
                    K.block_reduce(arr, 2, 2, "average"), arr.shape[0], arr.shape[1]
                )
                pan = 0.299 * arr[:, :, 0] + 0.587 * arr[:, :, 1] + 0.114 * arr[:, :, 2]
                out = morph.pansharpen(pan, ms, weights=[0.299, 0.587, 0.114])
                q = np.clip(np.round(out), 0, 255).astype(np.uint8)
                rows.append(
                    (r.image_id, int(CK.checksum(q[:, :, 0])),
                     float(out.min()), float(out.max()), float(out.mean()))
                )
            yield pd.DataFrame(rows, columns=[f.name for f in _STAT_SCHEMA.fields])

    return _imgs(spark).mapInPandas(run, _STAT_SCHEMA)


_FOOTPRINT_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("n_rings", T.IntegerType()),
        T.StructField("area_px", T.DoubleType()),
        T.StructField("hull_area_px", T.DoubleType()),
    ]
)


def raster_footprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Valid-mask -> footprint rings + convex hull area
    (gdal_footprint semantics, apps/gdal_footprint_lib.cpp:98-198:
    mask band -> polygonize -> optional convex hull)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from gdal_spark.functions import codecs
        from gdal_spark.raster import kernels as K

        def hull_area(pts: np.ndarray) -> float:
            # Andrew monotone chain on ring vertices
            p = np.unique(pts, axis=0)
            if len(p) < 3:
                return 0.0
            p = p[np.lexsort((p[:, 1], p[:, 0]))]

            def half(points):
                out = []
                for q in points:
                    while len(out) >= 2 and np.cross(out[-1] - out[-2], q - out[-2]) <= 0:
                        out.pop()
                    out.append(q)
                return out

            lower = half(p)
            upper = half(p[::-1])
            ring = np.array(lower[:-1] + upper[:-1] + [lower[0]], dtype=float)
            x, y = ring[:, 0], ring[:, 1]
            return abs(0.5 * float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1])))

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = codecs.decode_image(r.bytes, r.fmt)
                mask = arr.mean(axis=2) > 32  # "valid data" mask
                rings = K.region_rings(mask) if mask.any() else []
                area = float(mask.sum())
                ha = hull_area(np.vstack(rings)) if rings else 0.0
                rows.append((r.image_id, len(rings), area, ha))
            yield pd.DataFrame(
                rows, columns=[f.name for f in _FOOTPRINT_SCHEMA.fields]
            )

    return _imgs(spark).mapInPandas(run, _FOOTPRINT_SCHEMA)


_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("pt_id", T.IntegerType()),
        T.StructField("v_near", T.DoubleType()),
        T.StructField("v_bilinear", T.DoubleType()),
    ]
)


def point_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample each image's gray band at 4 deterministic fractional points
    (GDALInterpolateAtPoint, alg/gdal_interpolateatpoint.cpp) — the
    gdallocationinfo restatement: points broadcast, images streamed."""
    from gdal_spark.raster import morph

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from gdal_spark.functions import codecs

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = codecs.decode_image(r.bytes, r.fmt)
                gray = 0.299 * arr[:, :, 0] + 0.587 * arr[:, :, 1] + 0.114 * arr[:, :, 2]
                h, w = gray.shape
                xs = np.array([0.5, w * 0.25, w * 0.5, w - 0.5])
                ys = np.array([0.5, h * 0.75, h * 0.5, h - 0.5])
                vn = morph.interpolate_at_point(gray, xs, ys, "near")
                vb = morph.interpolate_at_point(gray, xs, ys, "bilinear")
                for i in range(4):
                    rows.append((r.image_id, i, float(vn[i]), float(vb[i])))
            yield pd.DataFrame(rows, columns=[f.name for f in _SAMPLE_SCHEMA.fields])

    return _imgs(spark).mapInPandas(run, _SAMPLE_SCHEMA)


SPARK = {
    "raster_proximity": raster_proximity,
    "raster_sieve": raster_sieve,
    "raster_fillnodata": raster_fillnodata,
    "raster_focal_stats": raster_focal_stats,
    "raster_convolve_sharpen": raster_convolve_sharpen,
    "raster_pansharpen": raster_pansharpen,
    "raster_footprint": raster_footprint,
    "point_interpolate": point_interpolate,
}

ORACLE: dict[str, str] = {}
