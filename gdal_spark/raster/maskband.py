"""Nodata/alpha mask-band semantics (GDALRasterBand::GetMaskBand).

Transcribes the default-mask resolution ladder of
gcore/gdalrasterband.cpp GetMaskBand / GetMaskFlags
(autotest/gcore/mask.py expectations):

  1. band carries a nodata value           -> GMF_NODATA, mask =
     255 where pixel != nodata else 0;
  2. the dataset's LAST band is alpha
     (4-band RGBA / 2-band gray+alpha) and
     the queried band is not the alpha band -> GMF_ALPHA |
     GMF_PER_DATASET, mask = the alpha plane;
  3. otherwise                               -> GMF_ALL_VALID,
     mask = all 255.

The distributed form `with_mask_stats` computes per-image mask flags +
valid fraction over Arrow batches — the corpus-scale "which images have
holes" scan that drives footprint/nodata handling downstream.
"""

from __future__ import annotations

import numpy as np

GMF_ALL_VALID = 0x01
GMF_PER_DATASET = 0x02
GMF_ALPHA = 0x04
GMF_NODATA = 0x08


def _has_alpha(arr: np.ndarray) -> bool:
    return arr.ndim == 3 and arr.shape[2] in (2, 4)


def mask_flags(arr: np.ndarray, band: int = 1, nodata: float | None = None) -> int:
    """1-based band index -> GMF_* flags per the resolution ladder."""
    nbands = 1 if arr.ndim == 2 else arr.shape[2]
    if nodata is not None:
        return GMF_NODATA
    if _has_alpha(arr) and band != nbands:
        return GMF_ALPHA | GMF_PER_DATASET
    return GMF_ALL_VALID


def mask_band(arr: np.ndarray, band: int = 1, nodata: float | None = None) -> np.ndarray:
    """(h, w) uint8 mask for the 1-based band index."""
    h, w = arr.shape[:2]
    flags = mask_flags(arr, band, nodata)
    if flags == GMF_NODATA:
        plane = arr if arr.ndim == 2 else arr[:, :, band - 1]
        return np.where(plane != nodata, 255, 0).astype(np.uint8)
    if flags & GMF_ALPHA:
        return np.ascontiguousarray(arr[:, :, arr.shape[2] - 1]).astype(np.uint8)
    return np.full((h, w), 255, dtype=np.uint8)


def with_mask_stats(df, fmt_col: str = "fmt", nodata: float | None = None):
    """images(image_id, bytes[, fmt]) -> (image_id, band, flags,
    valid_frac, mask_cks) per band — the distributed mask scan."""
    import pandas as pd
    from pyspark.sql import types as T

    sch = T.StructType(
        [
            T.StructField("image_id", T.StringType()),
            T.StructField("band", T.IntegerType()),
            T.StructField("flags", T.IntegerType()),
            T.StructField("valid_frac", T.DoubleType()),
            T.StructField("mask_cks", T.IntegerType()),
        ]
    )

    def run(batches):
        from gdal_spark.functions import codecs
        from gdal_spark.functions.checksum import checksum

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = codecs.decode_image(bytes(r.bytes), getattr(r, fmt_col, "tiff"))
                nbands = 1 if arr.ndim == 2 else arr.shape[2]
                for b in range(1, nbands + 1):
                    m = mask_band(arr, b, nodata)
                    rows.append(
                        (
                            r.image_id, b, mask_flags(arr, b, nodata),
                            float((m > 0).mean()), int(checksum(m)),
                        )
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in sch.fields])

    return df.mapInPandas(run, sch)
