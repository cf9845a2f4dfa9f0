"""Driver-contract entries for the tenth driver wave (ENVISAT, HDF4,
TSX/COSAR, KML SuperOverlay).

  envisat_hdf4_mod — per nation key an Envisat PDS product (UWORD
    measurement records with per-record prefix bytes) and an HDF4 SD
    file written by the engine's writer; decoded sums must match the
    SQL closed forms.

  kmlso_tile_mod — per key a synthetic raster pushed through the KML
    SuperOverlay writer and re-opened through the pyramid reader; the
    round-trip must be pixel-exact (sum preserved) with the closed-form
    tile counts for the 2-zoom pyramid.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

EV_H, EV_W = 3, 6
H4_H, H4_W = 4, 5
KM_N = 512  # kmlso test raster side -> maxzoom 1, 5 tiles


def envisat_hdf4_mod(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.sources.tables import load

    n = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("k"))

    @pandas_udf(T.ArrayType(T.LongType()))
    def sums(keys: pd.Series) -> pd.Series:
        from gdal_spark.raster.envisat import MPH_SIZE, envisat_open
        from gdal_spark.raster.hdf4 import hdf4_open, hdf4_write_sds

        def build_envisat(k: int) -> bytes:
            prefix = 13
            dsr = prefix + EV_W * 2
            y, x = np.mgrid[0:EV_H, 0:EV_W]
            vals = ((k * 11 + y * 5 + x * 2) % 4096).astype(">u2")
            payload = b"".join(
                b"\x00" * prefix + vals[r].tobytes() for r in range(EV_H))
            dsd_size = 280
            sph_fields = (f"LINE_LENGTH=+{EV_W:05d}\n"
                          "DATA_TYPE=UWORD\nSAMPLE_TYPE=DETECTED\n")
            sph_text = sph_fields.ljust(600)
            sph_size = len(sph_text) + dsd_size
            off = MPH_SIZE + len(sph_text) + dsd_size
            dsd = (f'DS_NAME="MDS1"\nDS_TYPE=M\nFILENAME=""\n'
                   f"DS_OFFSET=+{off:020d}<bytes>\n"
                   f"DS_SIZE=+{len(payload):020d}<bytes>\n"
                   f"NUM_DSR=+{EV_H:010d}\n"
                   f"DSR_SIZE=+{dsr:010d}<bytes>\n").ljust(dsd_size)
            mph = (f'PRODUCT="MER_RR__1P_K{k}"\n'
                   f"SPH_SIZE=+{sph_size:010d}<bytes>\n"
                   f"NUM_DSD=+{1:010d}\n"
                   f"DSD_SIZE=+{dsd_size:010d}<bytes>\n").ljust(MPH_SIZE)
            return (mph + sph_text + dsd).encode() + payload

        out = []
        for k in keys:
            k = int(k)
            ev = envisat_open(build_envisat(k))
            ev_sum = int(ev.read_band(0).astype(np.int64).sum())

            y, x = np.mgrid[0:H4_H, 0:H4_W]
            arr = ((k * 7 + y * 3 + x) % 500).astype(np.int32)
            h4 = hdf4_open(hdf4_write_sds([("grid", arr)],
                                          {"key": str(k)}))
            ds = h4.datasets[0]
            h4_sum = int(np.asarray(ds["data"]).astype(np.int64).sum())
            ok = int(ds["name"] == "grid"
                     and h4.attributes.get("key") == str(k))
            out.append([ev_sum, h4_sum, ok])
        return pd.Series(out)

    s = sums(F.col("k"))
    return n.select(
        "k", s[0].alias("envisat_sum"), s[1].alias("hdf4_sum"),
        s[2].alias("meta_ok"),
    ).orderBy("k")


_EV_ORACLE = f"""
    SELECT n.n_nationkey AS k,
           (SELECT SUM((n.n_nationkey*11 + y.range*5 + x.range*2) % 4096)
            FROM range({EV_H}) y, range({EV_W}) x) AS envisat_sum,
           (SELECT SUM((n.n_nationkey*7 + y.range*3 + x.range) % 500)
            FROM range({H4_H}) y, range({H4_W}) x) AS hdf4_sum,
           1 AS meta_ok
    FROM nation n ORDER BY k
"""


def kmlso_tile_mod(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.sources.tables import load

    n = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("k"))

    @pandas_udf(T.ArrayType(T.LongType()))
    def roundtrip(keys: pd.Series) -> pd.Series:
        from gdal_spark.raster.kmlso import kmlso_open, kmlso_write

        out = []
        for k in keys:
            k = int(k)
            y, x = np.mgrid[0:KM_N, 0:KM_N]
            band = ((k * 3 + y + x) % 251).astype(np.uint8)
            arr = np.stack([band, band // 2, band // 3], axis=-1)
            gt = (10.0 + k, 0.01, 0.0, 50.0 + k, 0.0, -0.01)
            files = kmlso_write(arr, gt, fmt="PNG")
            n_png = sum(1 for f in files if f.endswith(".png"))
            n_kml = sum(1 for f in files if f.endswith(".kml"))
            ds = kmlso_open("doc.kml", files)
            img = ds.read()
            exact = int(bool((img[:, :, 0] == band).all()))
            out.append([n_png, n_kml, exact,
                        int(band.astype(np.int64).sum()),
                        int(img[:, :, 0].astype(np.int64).sum())])
        return pd.Series(out)

    r = roundtrip(F.col("k"))
    return n.select(
        "k", r[0].alias("n_tiles"), r[1].alias("n_kml"),
        r[2].alias("exact"), r[3].alias("src_sum"),
        r[4].alias("mosaic_sum"),
    ).orderBy("k")


_KM_ORACLE = f"""
    SELECT n.n_nationkey AS k,
           5 AS n_tiles,
           6 AS n_kml,
           1 AS exact,
           (SELECT SUM((n.n_nationkey*3 + y.range + x.range) % 251)
            FROM range({KM_N}) y, range({KM_N}) x) AS src_sum,
           (SELECT SUM((n.n_nationkey*3 + y.range + x.range) % 251)
            FROM range({KM_N}) y, range({KM_N}) x) AS mosaic_sum
    FROM nation n ORDER BY k
"""


SPARK = {
    "envisat_hdf4_mod": envisat_hdf4_mod,
    "kmlso_tile_mod": kmlso_tile_mod,
}

ORACLE = {
    "envisat_hdf4_mod": _EV_ORACLE,
    "kmlso_tile_mod": _KM_ORACLE,
}
