"""gdalcompare equivalent: golden-vs-new image QA, single and distributed.

Re-expresses osgeo_utils/gdalcompare.py (the reference's own regression
QA tool — find_diff/compare_db/compare_image_pixels at
gdalcompare.py:79,128,281): a compare returns the NUMBER OF DIFFERENCES
found, accumulated over a fixed check ladder —

  1. byte-identical files short-circuit to zero differences;
  2. size (w, h), band count, pixel type;
  3. geotransform (1e-10 tolerance, like compare_srs/geotransform);
  4. nodata;
  5. per-band checksum (GDALChecksumImage port) — only when checksums
     differ are pixels decoded and "Pixels Differing" / "Maximum Pixel
     Difference" computed, exactly the reference's lazy ladder.

`compare_tables` is the distributed form: golden and candidate tables
join on image_id and every pair is compared inside its task — the
per-row decoded-pixel invariant (PSNR gate's exact sibling) as a
reusable operator over a 10^12-image corpus.
"""

from __future__ import annotations

import numpy as np


def compare_images(
    golden: bytes,
    new: bytes,
    golden_fmt: str = "tiff",
    new_fmt: str = "tiff",
) -> dict:
    """-> {"found_diff": int, "findings": [str], "max_diff": float,
    "pixels_differing": int} (zeros when identical)."""
    from gdal_spark.functions import codecs
    from gdal_spark.functions.checksum import checksum

    golden, new = bytes(golden), bytes(new)
    out = {"found_diff": 0, "findings": [], "max_diff": 0.0,
           "pixels_differing": 0}
    if golden == new and golden_fmt == new_fmt:
        return out

    def _diff(msg: str) -> None:
        out["found_diff"] += 1
        out["findings"].append(msg)

    ga = codecs.decode_image(golden, golden_fmt)
    na = codecs.decode_image(new, new_fmt)
    gmeta = nmeta = {}
    if golden_fmt in ("tiff", "cog") or new_fmt in ("tiff", "cog"):
        from gdal_spark.functions.tiff import tiff_parse

        if golden_fmt in ("tiff", "cog"):
            _, gmeta = tiff_parse(golden)
        if new_fmt in ("tiff", "cog"):
            _, nmeta = tiff_parse(new)

    if ga.shape[:2] != na.shape[:2]:
        _diff(f"Size mismatch: {ga.shape[1]}x{ga.shape[0]} vs "
              f"{na.shape[1]}x{na.shape[0]}")
        return out
    gb = 1 if ga.ndim == 2 else ga.shape[2]
    nb = 1 if na.ndim == 2 else na.shape[2]
    if gb != nb:
        _diff(f"Band count mismatch: {gb} vs {nb}")
        return out
    if ga.dtype != na.dtype:
        _diff(f"Pixel type mismatch: {ga.dtype} vs {na.dtype}")
    ggt, ngt = gmeta.get("geotransform"), nmeta.get("geotransform")
    if ggt is not None and ngt is not None:
        if any(abs(a - b) > 1e-10 for a, b in zip(ggt, ngt)):
            _diff(f"Geotransform mismatch: {ggt} vs {ngt}")
    if gmeta.get("nodata") != nmeta.get("nodata"):
        _diff(f"NoData mismatch: {gmeta.get('nodata')} vs "
              f"{nmeta.get('nodata')}")

    ga3 = ga if ga.ndim == 3 else ga[:, :, None]
    na3 = na if na.ndim == 3 else na[:, :, None]
    for b in range(gb):
        if checksum(ga3[:, :, b]) == checksum(na3[:, :, b]):
            continue
        d = np.abs(ga3[:, :, b].astype(np.float64)
                   - na3[:, :, b].astype(np.float64))
        nd = int((d > 0).sum())
        md = float(d.max())
        _diff(f"Band {b + 1} checksum difference "
              f"(pixels_differing={nd}, max_diff={md:g})")
        out["pixels_differing"] += nd
        out["max_diff"] = max(out["max_diff"], md)
    return out


def compare_tables(golden_df, new_df, on: str = "image_id",
                   fmt_col: str = "fmt"):
    """Distributed gdalcompare: join golden/new on ``on`` and compare
    each pair in its task. -> (image_id, found_diff, max_diff,
    pixels_differing, findings)."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    g = golden_df.select(
        F.col(on), F.col("bytes").alias("_gb"), F.col(fmt_col).alias("_gf")
    )
    n = new_df.select(
        F.col(on), F.col("bytes").alias("_nb"), F.col(fmt_col).alias("_nf")
    )
    joined = g.join(n, on, "inner")
    sch = T.StructType(
        [
            T.StructField(on, T.StringType()),
            T.StructField("found_diff", T.IntegerType()),
            T.StructField("max_diff", T.DoubleType()),
            T.StructField("pixels_differing", T.LongType()),
            T.StructField("findings", T.StringType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            rows = []
            # no itertuples: namedtuple renames leading-underscore columns
            for key, gb, gf, nb, nf in zip(
                pdf[on], pdf["_gb"], pdf["_gf"], pdf["_nb"], pdf["_nf"]
            ):
                c = compare_images(bytes(gb), bytes(nb),
                                   golden_fmt=gf, new_fmt=nf)
                rows.append(
                    (key, c["found_diff"], c["max_diff"],
                     c["pixels_differing"], "; ".join(c["findings"]))
                )
            yield pd.DataFrame(rows, columns=[f.name for f in sch.fields])

    return joined.mapInPandas(run, sch)
