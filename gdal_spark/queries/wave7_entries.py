"""Driver-contract entries for the CEOS / SAR_CEOS / RCM / PRF /
RPFTOC driver wave.

Both queries are closed-form so DuckDB recomputes every output value:

  sar_ceos_mod — one synthetic SAR_CEOS volume per nation key (real
    12-byte record walk, RadarSat IMAGE_OPT recipe fields, BSQ uint8
    payload) with pixel(r, c) = (k*7 + r*3 + c*5) % 251; the engine's
    record scanner + recipe resolver + interleave reader decode it
    distributedly and per-(key, row) sums must hash-match the closed
    form. Reference semantics: frmts/ceos2 ProcessData /
    CeosDefaultRecipe / CalcCeosSARImageFilePosition.

  rcm_calib_mod — per nation key an RCM calibration LUT XML
    (numberOfValues=2, positive stepSize -> the InterpolateValues
    forward-interpolation path of frmts/rcm/rcmdataset.cpp) is parsed
    by the engine's read_lut and applied with the detected-product
    formula (DN^2 + offset) / gain; DuckDB recomputes the
    interpolation and formula exactly.
"""

from __future__ import annotations

import struct

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

W, H = 16, 8  # SAR_CEOS synth dims
RW = 12       # RCM LUT width (stepSize = RW // 2)


def _synth_sar_ceos(k: int) -> bytes:
    """Minimal BSQ uint8 SAR_CEOS imagery file around the closed form."""
    ids = 192
    bpr = ids + W
    fdl = 448
    hdr = bytearray(fdl)
    struct.pack_into(">i", hdr, 0, 1)
    hdr[4:8] = bytes((63, 192, 18, 18))
    struct.pack_into(">i", hdr, 8, fdl)

    def put(off, n, s):
        hdr[off - 1 : off - 1 + n] = s.ljust(n).encode()[:n]

    put(225, 4, "1")        # bytes per pixel
    put(233, 4, "1")        # channels
    put(237, 8, str(H))     # lines
    put(249, 8, str(W))     # pixels per line
    put(269, 4, "BSQ")
    put(273, 2, "1")        # records per line
    put(277, 4, "180")      # prefix (ids -> 192 after the +12 patch)
    put(281, 8, str(W))     # pixel data bytes per record
    put(289, 4, "0")        # suffix
    put(429, 4, "IU1")
    body = bytearray()
    for r in range(H):
        rec = bytearray(bpr)
        struct.pack_into(">i", rec, 0, 2 + r)
        rec[4:8] = bytes((50, 11, 18, 20))
        struct.pack_into(">i", rec, 8, bpr)
        for c in range(W):
            rec[ids + c] = (k * 7 + r * 3 + c * 5) % 251
        body += rec
    return bytes(hdr) + bytes(body)


def sar_ceos_mod(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.sources.tables import load

    n = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("k")
    )

    @pandas_udf(T.ArrayType(T.DoubleType()))
    def decode_rows(keys: pd.Series) -> pd.Series:
        from gdal_spark.raster.ceos import (
            IMAGRY_OPT_FILE, SARCEOSVolume, image_desc, scan_records,
        )

        out = []
        for k in keys:
            data = _synth_sar_ceos(int(k))
            records, status = scan_records(data, IMAGRY_OPT_FILE,
                                           max_records=4)
            assert status != "error"
            vol = SARCEOSVolume(data, records, image_desc(records))
            assert (vol.width, vol.height, vol.nbands) == (W, H, 1)
            band = vol.read_band(1)
            out.append([float(v) for v in
                        band.astype("float64").sum(axis=1)])
        return pd.Series(out)

    return n.select(
        F.col("k"),
        F.posexplode(decode_rows(F.col("k"))).alias("row_id", "row_sum"),
    )


_SAR_CEOS_ORACLE = f"""
    SELECT n.n_nationkey AS k, r.range AS row_id,
           sum(CAST((n.n_nationkey * 7 + r.range * 3 + c.range * 5) % 251
               AS DOUBLE)) AS row_sum
    FROM nation n CROSS JOIN range({H}) r CROSS JOIN range({W}) c
    GROUP BY n.n_nationkey, r.range
"""


def rcm_calib_mod(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.sources.tables import load

    n = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("k")
    )
    step = RW // 2

    @pandas_udf(T.ArrayType(T.DoubleType()))
    def calibrate(keys: pd.Series) -> pd.Series:
        import numpy as np

        from gdal_spark.raster.rcm import read_lut

        out = []
        for k in keys:
            k = int(k)
            g0, g1 = float(2 + k % 5), float(4 + k % 7)
            xml = (
                "<lut><pixelFirstLutValue>0</pixelFirstLutValue>"
                f"<stepSize>{step}</stepSize>"
                "<numberOfValues>2</numberOfValues>"
                f"<offset>{k}</offset>"
                f"<gains>{g0} {g1}</gains></lut>"
            )
            gains, offset = read_lut(xml)
            dn = np.arange(RW, dtype=np.float64) + (k % 11)
            cal = (dn * dn + offset) / gains[:RW]
            out.append([round(float(v), 4) for v in cal])
        return pd.Series(out)

    return n.select(
        F.col("k"),
        F.posexplode(calibrate(F.col("k"))).alias("col_id", "calib"),
    )


# InterpolateValues with positive stepSize: table[j] = g0 + (g1-g0)*j/step
# for j < step, then g1 held for the second run (valueTo == valueFrom).
_RCM_ORACLE = f"""
    SELECT n.n_nationkey AS k, c.range AS col_id,
           round((CAST((c.range + n.n_nationkey % 11) AS DOUBLE)
                  * (c.range + n.n_nationkey % 11) + n.n_nationkey)
                 /
                 (CASE WHEN c.range < {RW // 2}
                       THEN (2 + n.n_nationkey % 5)
                            + ((4 + n.n_nationkey % 7)
                               - (2 + n.n_nationkey % 5))
                              * c.range / {RW // 2}
                       ELSE (4 + n.n_nationkey % 7) END), 4) AS calib
    FROM nation n CROSS JOIN range({RW}) c
"""


MM_W, MM_H = 16, 6


def _synth_miramon(tmpdir: str, k: int) -> str:
    """Write a minimal byte-RLE MiraMon raster (img + I.rel).

    Row r = 8 repeated pixels of (k + r) % 200 (an RLE run) followed by
    8 literal pixels (k*3 + r*5 + j) % 251 (a counter-0 literal block).
    """
    import os

    img = bytearray()
    for r in range(MM_H):
        img += bytes([8, (k + r) % 200, 0, 8])
        img += bytes([(k * 3 + r * 5 + j) % 251 for j in range(8)])
    name = f"mm_{k}"
    with open(os.path.join(tmpdir, name + ".img"), "wb") as f:
        f.write(bytes(img))
    rel = (
        "[VERSIO]\nVersMetaDades=5\nSubVersMetaDades=0\nVers=4\nSubVers=3\n\n"
        f"[OVERVIEW:ASPECTES_TECNICS]\ncolumns={MM_W}\nrows={MM_H}\n\n"
        "[EXTENT]\nMinX=0\nMaxX=16\nMinY=0\nMaxY=6\n\n"
        "[ATTRIBUTE_DATA]\nTipusCompressio=byte-RLE\n"
        "TractamentVariable=Categoric\nIndexsNomsCamps=1\nNomCamp_1=G1\n"
    )
    with open(os.path.join(tmpdir, name + "I.rel"), "w",
              encoding="latin-1") as f:
        f.write(rel)
    return os.path.join(tmpdir, name + "I.rel")


def miramon_rle_mod(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.sources.tables import load

    n = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("k")
    )

    @pandas_udf(T.ArrayType(T.DoubleType()))
    def decode_rows(keys: pd.Series) -> pd.Series:
        import tempfile

        from gdal_spark.raster.miramon import miramon_open

        out = []
        with tempfile.TemporaryDirectory() as td:
            for k in keys:
                rel = _synth_miramon(td, int(k))
                ds = miramon_open(rel)
                band = ds.bands[0]
                assert (band.width, band.height) == (MM_W, MM_H)
                a = band.read().astype("float64")
                out.append([float(v) for v in a.sum(axis=1)])
        return pd.Series(out)

    return n.select(
        F.col("k"),
        F.posexplode(decode_rows(F.col("k"))).alias("row_id", "row_sum"),
    )


_MIRAMON_ORACLE = f"""
    SELECT n.n_nationkey AS k, r.range AS row_id,
           8 * CAST((n.n_nationkey + r.range) % 200 AS DOUBLE)
           + (SELECT sum(CAST((n.n_nationkey * 3 + r.range * 5 + j.range)
                              % 251 AS DOUBLE))
              FROM range(8) j) AS row_sum
    FROM nation n CROSS JOIN range({MM_H}) r
"""


H5_W, H5_H = 12, 5


def hdf5_grid_mod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip a closed-form int32 grid through the engine's own
    HDF5 writer + reader (superblock, symbol-table group, object
    headers, contiguous layout) per nation key."""
    from gdal_spark.sources.tables import load

    n = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("k")
    )

    @pandas_udf(T.ArrayType(T.DoubleType()))
    def roundtrip(keys: pd.Series) -> pd.Series:
        import numpy as np

        from gdal_spark.functions.hdf5lib import hdf5_open, hdf5_write_simple

        out = []
        for k in keys:
            k = int(k)
            r, c = np.meshgrid(np.arange(H5_H), np.arange(H5_W),
                               indexing="ij")
            grid = ((k * 13 + r * 7 + c * 11) % 103).astype(np.int32)
            f = hdf5_open(hdf5_write_simple({"g": grid}))
            a = f.get("/g").read()
            assert a.shape == (H5_H, H5_W)
            out.append([float(v) for v in
                        a.astype("float64").sum(axis=1)])
        return pd.Series(out)

    return n.select(
        F.col("k"),
        F.posexplode(roundtrip(F.col("k"))).alias("row_id", "row_sum"),
    )


_HDF5_ORACLE = f"""
    SELECT n.n_nationkey AS k, r.range AS row_id,
           sum(CAST((n.n_nationkey * 13 + r.range * 7 + c.range * 11) % 103
               AS DOUBLE)) AS row_sum
    FROM nation n CROSS JOIN range({H5_H}) r CROSS JOIN range({H5_W}) c
    GROUP BY n.n_nationkey, r.range
"""


SPARK = {
    "sar_ceos_mod": sar_ceos_mod,
    "rcm_calib_mod": rcm_calib_mod,
    "miramon_rle_mod": miramon_rle_mod,
    "hdf5_grid_mod": hdf5_grid_mod,
}
ORACLE = {
    "sar_ceos_mod": _SAR_CEOS_ORACLE,
    "rcm_calib_mod": _RCM_ORACLE,
    "miramon_rle_mod": _MIRAMON_ORACLE,
    "hdf5_grid_mod": _HDF5_ORACLE,
}
