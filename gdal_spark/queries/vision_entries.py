"""Contract entries for the vision-algorithm set: viewshed, color
quantization + dither, feature matching.

These close the last three 2.7 rows (previously declared out of scope):
  * viewshed / LOS — alg/viewshed/ (raster/viewshed.py, Wang-plane
    propagation);
  * median-cut PCT + Floyd-Steinberg dither — alg/gdalmediancut.cpp +
    alg/gdaldither.cpp (raster/quantize.py);
  * feature matching — alg/gdal_simplesurf.cpp GDALComputeMatchingPoints
    (raster/matching.py).

All three are per-image Arrow-batch work (mapInPandas, no shuffle, no
driver involvement) and carry SELF-CHECKING invariant columns the bench
and tests assert on; driver rows are rows-only (pixel kernels are not
DuckDB-expressible), exactness is pinned by the module pytest goldens.
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


def _imgs(spark: SparkSession, n: int = N) -> DataFrame:
    return datagen.images_df(spark, n, with_pixels=True, size_cap=CAP)


_VIEWSHED_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("visible_px", T.LongType()),
        T.StructField("total_px", T.LongType()),
        T.StructField("cks", T.IntegerType()),
        T.StructField("monotone_ok", T.BooleanType()),
    ]
)


def raster_viewshed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gdal_viewshed from the image center over the luma DEM.  Invariant
    column: raising the observer can only grow the visible set
    (monotone_ok), which pins the propagation's direction without an
    external oracle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from gdal_spark.functions import checksum as CK
        from gdal_spark.functions import codecs
        from gdal_spark.raster import morph
        from gdal_spark.raster.ops import _luma
        from gdal_spark.raster import viewshed as V

        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                # smooth the luma proxy into terrain-like relief first
                # (raw synthetic texture is pixel-scale noise)
                dem = morph.focal_stat(
                    _luma(codecs.decode_image(bytes(r.bytes), r.fmt)), 5, "mean"
                )
                oy, ox = dem.shape[0] // 2, dem.shape[1] // 2
                low = V.viewshed(dem, ox, oy, observer_height=2.0)
                high = V.viewshed(dem, ox, oy, observer_height=40.0)
                mono = bool(((low == 255) <= (high == 255)).all())
                rows.append(
                    (
                        r.image_id,
                        int((low == 255).sum()),
                        int(low.size),
                        int(CK.checksum(low)),
                        mono,
                    )
                )
            yield pd.DataFrame(
                rows, columns=["image_id", "visible_px", "total_px", "cks", "monotone_ok"]
            )

    return _imgs(spark).mapInPandas(run, _VIEWSHED_SCHEMA).orderBy("image_id")


_QUANT_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("n_colors", T.IntegerType()),
        T.StructField("mae_dither", T.DoubleType()),
        T.StructField("mae_nearest", T.DoubleType()),
        T.StructField("cks_idx", T.IntegerType()),
    ]
)


def raster_quantize_dither(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rgb2pct: median-cut 16-color PCT + Floyd-Steinberg dither.  The
    mean-abs reconstruction errors of the dithered and nearest-color
    mappings are reported side by side (dither preserves local mean, so
    a broken error diffusion shows up immediately)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from gdal_spark.functions import checksum as CK
        from gdal_spark.functions import codecs
        from gdal_spark.raster import quantize as Q

        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                arr = codecs.decode_image(bytes(r.bytes), r.fmt)
                pal = Q.median_cut_pct(arr, n_colors=16)
                idx = Q.dither_rgb(arr, pal)
                rec = Q.apply_pct(idx, pal).astype(np.float64)
                nn = Q.apply_pct(Q.nearest_index(arr, pal), pal).astype(np.float64)
                a = arr.astype(np.float64)
                rows.append(
                    (
                        r.image_id,
                        int(len(pal)),
                        round(float(np.abs(rec - a).mean()), 4),
                        round(float(np.abs(nn - a).mean()), 4),
                        int(CK.checksum(idx)),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["image_id", "n_colors", "mae_dither", "mae_nearest", "cks_idx"],
            )

    return _imgs(spark).mapInPandas(run, _QUANT_SCHEMA).orderBy("image_id")


_MATCH_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("n_matches", T.IntegerType()),
        T.StructField("median_dx", T.DoubleType()),
        T.StructField("shift_ok", T.BooleanType()),
    ]
)

_SHIFT = 5


def raster_feature_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GDALComputeMatchingPoints self-check: match each image's luma
    against a copy shifted +5 px in x; the median matched displacement
    must recover the shift (shift_ok)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from gdal_spark.functions import codecs
        from gdal_spark.raster.ops import _luma
        from gdal_spark.raster import matching as M

        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                g = _luma(codecs.decode_image(bytes(r.bytes), r.fmt))
                shifted = np.empty_like(g)
                shifted[:, _SHIFT:] = g[:, : g.shape[1] - _SHIFT]
                shifted[:, :_SHIFT] = g[:, :1]
                pairs = M.compute_matching_points(g, shifted, threshold=0.0003)
                if pairs:
                    dxs = [x2 - x1 for x1, _, x2, _ in pairs]
                    med = float(np.median(dxs))
                    ok = abs(med - _SHIFT) <= 1.0
                else:
                    med, ok = float("nan"), False
                rows.append((r.image_id, len(pairs), med, ok))
            yield pd.DataFrame(
                rows, columns=["image_id", "n_matches", "median_dx", "shift_ok"]
            )

    return _imgs(spark).mapInPandas(run, _MATCH_SCHEMA).orderBy("image_id")


SPARK = {
    "raster_viewshed": raster_viewshed,
    "raster_quantize_dither": raster_quantize_dither,
    "raster_feature_match": raster_feature_match,
}

ORACLE: dict[str, str] = {}
