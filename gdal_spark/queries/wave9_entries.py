"""Driver-contract entries for the ninth driver wave (small SAR
formats, WAsP, Selafin, VFK).

All three queries synthesize per-key fixtures inside an Arrow-batched
pandas UDF, push them through the real drivers, and emit integer/exact
aggregates that DuckDB recomputes closed-form:

  sar_wave_mod — per nation key a GFF CInt16 scene, a COSAR v1
    annotated matrix and a JAXA PALSAR level-1.5 IMG file with
    pixel values that are simple modular forms of (k, y, x); the
    decoded I/Q/amplitude sums must match the SQL closed form.

  wasp_selafin_mod — per key a WAsP roughness .map written by the
    engine's writer and re-read by its reader (feature count, z sums,
    point totals) plus a Selafin 2x2 node mesh with one quad element
    round-tripped through the Fortran-record writer (element average
    is exactly 3k + 1.5).

  vfk_par_mod — per key a VFK file whose SOBR/SBP/HP/PAR blocks
    describe one rectangular parcel of key-dependent size; the
    assembled PAR ring must close and its envelope area equals the
    closed form (10 + k%5) * (20 + k%7).
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

GFF_H, GFF_W = 4, 5
COS_H, COS_W = 3, 4
PAL_H, PAL_W = 2, 3


# --------------------------------------------------------------- fixtures

def _gff_fixture(k: int) -> bytes:
    hdr = bytearray(128)
    hdr[0:7] = b"GSATIMG"
    struct.pack_into("<HH", hdr, 8, 0, 2)
    struct.pack_into("<I", hdr, 12, 128)
    struct.pack_into("<6I", hdr, 56, 4, 1, 1, 1, GFF_W * 2, GFF_H)
    iq = np.empty((GFF_H, GFF_W, 2), "<i2")
    y, x = np.mgrid[0:GFF_H, 0:GFF_W]
    iq[..., 0] = (k + 3 * y + x) % 100
    iq[..., 1] = (2 * k + y) % 50
    return bytes(hdr) + iq.tobytes()


def _cosar_fixture(k: int) -> bytes:
    rtnb = (COS_W + 2) * 4
    buf = bytearray(rtnb * (4 + COS_H))
    struct.pack_into(">i", buf, 8, COS_W)
    struct.pack_into(">i", buf, 12, COS_H)
    struct.pack_into(">I", buf, 20, rtnb)
    buf[28:32] = b"CSAR"
    struct.pack_into(">I", buf, 32, 1)
    for yy in range(COS_H):
        base = rtnb * (yy + 4)
        struct.pack_into(">II", buf, base, 1, COS_W)
        iq = np.empty((COS_W, 2), ">i2")
        xs = np.arange(COS_W)
        iq[:, 0] = (k * 2 + yy + xs) % 77
        iq[:, 1] = (k + 2 * xs) % 31
        buf[base + 8:base + 8 + iq.nbytes] = iq.tobytes()
    return bytes(buf)


def _palsar_fixture(k: int) -> dict[str, bytes]:
    vol = bytearray(360)
    struct.pack_into(">I", vol, 0, 1)
    vol[4], vol[5], vol[6], vol[7] = 192, 192, 18, 18
    struct.pack_into(">I", vol, 8, 360)
    vol[60:62] = b"AL"
    rec = 192 + PAL_W * 2
    img = bytearray(720 + (PAL_H + 1) * rec)
    img[216:220] = b"  16"
    img[220:224] = b"   1"
    img[236:244] = f"{PAL_H:8d}".encode()
    img[186:192] = f"{rec:6d}".encode()
    y, x = np.mgrid[0:PAL_H, 0:PAL_W]
    vals = ((k * 5 + y * 3 + x) % 1000).astype(">u2")
    for yy in range(PAL_H):
        off = 720 + (yy - 1) * rec + 192
        img[off:off + PAL_W * 2] = vals[yy].tobytes()
    suffix = "-ALPSRP000000000-H1.5_UA"
    return {f"VOL{suffix}": bytes(vol), f"IMG-HH{suffix}": bytes(img)}


# ---------------------------------------------------------------- queries

def sar_wave_mod(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.sources.tables import load

    n = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("k"))

    @pandas_udf(T.ArrayType(T.LongType()))
    def sums(keys: pd.Series) -> pd.Series:
        from gdal_spark.raster.sar_small import gff_decode, palsar_read
        from gdal_spark.raster.tsx import cosar_decode

        out = []
        for k in keys:
            k = int(k)
            g, _ = gff_decode(_gff_fixture(k))
            c, _ = cosar_decode(_cosar_fixture(k))
            files = _palsar_fixture(k)
            vol = [nm for nm in files if nm.startswith("VOL")][0]
            bands, _, _ = palsar_read(vol, files)
            out.append([
                int(g.real.sum()), int(g.imag.sum()),
                int(c.real.sum()), int(c.imag.sum()),
                int(bands[0][1].astype(np.int64).sum()),
            ])
        return pd.Series(out)

    s = sums(F.col("k"))
    return n.select(
        "k",
        s[0].alias("gff_sum_i"), s[1].alias("gff_sum_q"),
        s[2].alias("cosar_sum_i"), s[3].alias("cosar_sum_q"),
        s[4].alias("palsar_sum"),
    ).orderBy("k")


_SAR_ORACLE = f"""
    SELECT n.n_nationkey AS k,
           (SELECT SUM((n.n_nationkey + 3*y.range + x.range) % 100)
            FROM range({GFF_H}) y, range({GFF_W}) x) AS gff_sum_i,
           (SELECT SUM((2*n.n_nationkey + y.range) % 50)
            FROM range({GFF_H}) y, range({GFF_W}) x) AS gff_sum_q,
           (SELECT SUM((n.n_nationkey*2 + y.range + x.range) % 77)
            FROM range({COS_H}) y, range({COS_W}) x) AS cosar_sum_i,
           (SELECT SUM((n.n_nationkey + 2*x.range) % 31)
            FROM range({COS_H}) y, range({COS_W}) x) AS cosar_sum_q,
           (SELECT SUM((n.n_nationkey*5 + y.range*3 + x.range) % 1000)
            FROM range({PAL_H}) y, range({PAL_W}) x) AS palsar_sum
    FROM nation n ORDER BY k
"""


def wasp_selafin_mod(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.sources.tables import load

    n = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("k"))

    @pandas_udf(T.ArrayType(T.DoubleType()))
    def roundtrip(keys: pd.Series) -> pd.Series:
        from gdal_spark.sources.selafin import (
            SelafinHeader, element_features, selafin_read, selafin_write,
        )
        from gdal_spark.sources.wasp import WaspWriter, wasp_read

        out = []
        for k in keys:
            k = int(k)
            nf = k % 4 + 2
            w = WaspWriter(fields=["z_left", "z_right"])
            for i in range(nf):
                w.add_line([(i, 0), (i, 0.5), (i, 1)],
                           float(k + i), float(k + i + 1))
            feats, _meta = wasp_read(w.render())
            sum_zl = sum(f["z_left"] for f in feats)
            total_pts = sum(len(f["coords"]) for f in feats)

            h = SelafinHeader()
            h.title = f"t{k}"
            h.variables = ["v"]
            h.x = np.array([0.0, 1.0, 1.0, 0.0])
            h.y = np.array([0.0, 0.0, 1.0, 1.0])
            h.n_points = 4
            h.border = np.zeros(4, np.int64)
            h.steps = [(0.0, np.array([[k * 3.0 + i for i in range(4)]]))]
            h.n_elements = 1
            h.points_per_element = 4
            h.connectivity = np.array([1, 2, 3, 4], np.int64)
            h2 = selafin_read(selafin_write(h))
            elems = element_features(h2)
            out.append([float(len(feats)), float(sum_zl), float(total_pts),
                        float(elems[0][1]["v"]), float(h2.n_points)])
        return pd.Series(out)

    r = roundtrip(F.col("k"))
    return n.select(
        "k",
        r[0].alias("n_features"), r[1].alias("sum_zl"),
        r[2].alias("total_pts"), r[3].alias("elem_avg"),
        r[4].alias("mesh_points"),
    ).orderBy("k")


_WASP_ORACLE = """
    SELECT n.n_nationkey AS k,
           CAST(n.n_nationkey % 4 + 2 AS DOUBLE) AS n_features,
           CAST((n.n_nationkey % 4 + 2) * n.n_nationkey
                + (n.n_nationkey % 4 + 2) * (n.n_nationkey % 4 + 1) / 2.0
                AS DOUBLE) AS sum_zl,
           CAST((n.n_nationkey % 4 + 2) * 3 AS DOUBLE) AS total_pts,
           CAST(n.n_nationkey * 3 + 1.5 AS DOUBLE) AS elem_avg,
           CAST(4 AS DOUBLE) AS mesh_points
    FROM nation n ORDER BY k
"""


def vfk_par_mod(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.sources.tables import load

    n = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("k"))

    @pandas_udf(T.ArrayType(T.DoubleType()))
    def parcel(keys: pd.Series) -> pd.Series:
        from gdal_spark.sources.vfk import VFKFile

        out = []
        for k in keys:
            k = int(k)
            wdt, hgt = 10 + k % 5, 20 + k % 7
            # S-JTSK: stored as (Y, X), surfaced as (-Y, -X)
            corners = [(0, 0), (wdt, 0), (wdt, hgt), (0, hgt)]
            lines = ["&HVERZE;\"6.0\"",
                     "&BSOBR;ID N30;CISLO_BODU N12;"
                     "SOURADNICE_Y N10.2;SOURADNICE_X N10.2",
                     "&BSBP;BP_ID N30;PORADOVE_CISLO_BODU N11;HP_ID N30",
                     "&BHP;ID N30;PAR_ID_1 N30;PAR_ID_2 N30",
                     "&BPAR;ID N30;KMENOVE_CISLO_PAR N5"]
            for i, (yy, xx) in enumerate(corners):
                lines.append(f"&DSOBR;{100 + i};{i};{yy};{xx}")
            pid = 900 + k
            for e in range(4):
                hid = 500 + e
                a, b = 100 + e, 100 + (e + 1) % 4
                lines.append(f"&DSBP;{a};1;{hid}")
                lines.append(f"&DSBP;{b};2;{hid}")
                lines.append(f"&DHP;{hid};{pid};")
            lines.append(f"&DPAR;{pid};{k}")
            f = VFKFile("\n".join(lines) + "\n")
            rings = f.geometries("PAR")[0]
            ext = rings[0]
            closed = 1.0 if tuple(ext[0]) == tuple(ext[-1]) else 0.0
            area = float(
                (ext[:, 0].max() - ext[:, 0].min())
                * (ext[:, 1].max() - ext[:, 1].min()))
            out.append([float(len(f.layers)), float(len(rings)),
                        closed, area])
        return pd.Series(out)

    r = parcel(F.col("k"))
    return n.select(
        "k",
        r[0].alias("n_layers"), r[1].alias("n_rings"),
        r[2].alias("ring_closed"), r[3].alias("env_area"),
    ).orderBy("k")


_VFK_ORACLE = """
    SELECT n.n_nationkey AS k,
           CAST(4 AS DOUBLE) AS n_layers,
           CAST(1 AS DOUBLE) AS n_rings,
           CAST(1 AS DOUBLE) AS ring_closed,
           CAST((10 + n.n_nationkey % 5) * (20 + n.n_nationkey % 7)
                AS DOUBLE) AS env_area
    FROM nation n ORDER BY k
"""


SPARK = {
    "sar_wave_mod": sar_wave_mod,
    "wasp_selafin_mod": wasp_selafin_mod,
    "vfk_par_mod": vfk_par_mod,
}

ORACLE = {
    "sar_wave_mod": _SAR_ORACLE,
    "wasp_selafin_mod": _WASP_ORACLE,
    "vfk_par_mod": _VFK_ORACLE,
}
