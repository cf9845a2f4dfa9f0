"""Raster Attribute Table (RAT) — gcore/gdal_rat.cpp re-expressed Spark-first.

GDAL's GDALRasterAttributeTable is a small relational side-table attached
to a band: one row per pixel class, columns tagged with a usage
(GFU_MinMax / GFU_Min / GFU_Max / GFU_PixelCount / GFU_Name / GFU_Red ...,
gcore/gdal_rat.h:92-119).  ``GetRowOfValue`` maps a pixel value to its
row either by linear binning — ``floor((v - row0_min)/bin_size)``, -1
outside [0, n_rows) (gcore/gdal_rat.cpp:892-905 default impl,
GDALDefaultRasterAttributeTable::GetRowOfValue) — or by per-row
min/max range scan.

Spark mapping (SURVEY §2 "Raster Attribute Table"): the RAT is an
ordinary small DataFrame keyed by row index / class value and
broadcast-joined onto pixel-class aggregates.  The binning itself is a
pure Column expression (whole-stage codegen, no UDF); per-pixel
histogramming runs inside the Arrow decode batch where the pixels
already live.  At 100 TB the RAT side is KB-sized → always broadcast;
the per-image histogram is a map-side numpy bincount, so the only
shuffle is the optional global per-class roll-up on an int key.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Field-usage tags (gcore/gdal_rat.h:33-60, GDALRATFieldUsage)
GFU_GENERIC = "generic"
GFU_PIXELCOUNT = "pixelcount"
GFU_NAME = "name"
GFU_MIN = "min"
GFU_MAX = "max"
GFU_MINMAX = "minmax"


def row_of_value_linear(
    value: Column, row0_min: float, bin_size: float, n_rows: int
) -> Column:
    """GetRowOfValue with linear binning as a pure Column:
    ``floor((v - row0_min)/bin_size)``; -1 when the bin falls outside
    [0, n_rows) (gcore/gdal_rat.cpp GDALDefaultRasterAttributeTable::
    GetRowOfValue, linear-binning branch)."""
    bin_ = F.floor((value - F.lit(float(row0_min))) / F.lit(float(bin_size)))
    ok = (bin_ >= 0) & (bin_ < int(n_rows))
    return F.when(ok, bin_).otherwise(F.lit(-1)).cast("int")


def attach_linear(
    df: DataFrame,
    value_col: str,
    rat: DataFrame,
    row0_min: float,
    bin_size: float,
    n_rows: int,
    row_col: str = "rat_row",
) -> DataFrame:
    """Classify ``df[value_col]`` by linear binning and broadcast-join the
    RAT's fields (left join: out-of-range rows keep NULL fields, matching
    GetRowOfValue == -1)."""
    classified = df.withColumn(
        row_col, row_of_value_linear(F.col(value_col), row0_min, bin_size, n_rows)
    )
    return classified.join(F.broadcast(rat), on=row_col, how="left")


def attach_ranges(
    df: DataFrame,
    value_col: str,
    rat: DataFrame,
    min_col: str = "vmin",
    max_col: str = "vmax",
) -> DataFrame:
    """GetRowOfValue via GFU_Min/GFU_Max range columns: a broadcast
    range-join ``vmin <= v < vmax`` (the default RAT's per-row scan,
    gcore/gdal_rat.cpp range branch).  RAT rows are few, so the
    broadcast-nested-loop plan is the right one at any scale."""
    v = F.col(value_col)
    cond = (v >= F.col(min_col)) & (v < F.col(max_col))
    return df.join(F.broadcast(rat), on=cond, how="left")


_HIST_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("rat_row", T.IntegerType()),
        T.StructField("pixel_count", T.LongType()),
    ]
)


def band_histogram_rat(
    images: DataFrame, row0_min: float, bin_size: float, n_rows: int
) -> DataFrame:
    """Per-image per-RAT-row pixel counts over the luma band — the
    GFU_PixelCount column a GDAL RAT carries (gcore/gdal_rat.h:41).
    Linear binning applied with numpy inside the Arrow batch (the pixels
    never leave the executor); out-of-range pixels bin to -1."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from gdal_spark.functions import codecs
        from gdal_spark.raster.ops import _luma

        for pdf in batches:
            out: list[tuple[str, int, int]] = []
            for r in pdf.itertuples():
                arr = codecs.decode_image(bytes(r.bytes), r.fmt)
                lum = _luma(arr)
                bins = np.floor((lum - row0_min) / bin_size).astype(np.int64)
                bins = np.where((bins < 0) | (bins >= n_rows), -1, bins)
                idx, cnt = np.unique(bins, return_counts=True)
                out.extend(
                    (r.image_id, int(i), int(c)) for i, c in zip(idx, cnt)
                )
            yield pd.DataFrame(out, columns=["image_id", "rat_row", "pixel_count"])

    return images.mapInPandas(run, _HIST_SCHEMA)
