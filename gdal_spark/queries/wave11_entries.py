"""Driver-contract entry for the eleventh driver wave (DDS, CPHD,
TIGER/Line, EDIGEO).

  wave11_mod — per nation key: a DDS uncompressed round trip (pixel
    sum), a synthetic CPHD product (signal I-sum over a key-derived
    complex block), a TIGER RT1+RT2 chain (vertex count + scaled
    endpoint sum) and an EDIGEO lot holding one rectangular parcel
    (ring closure + envelope area). All outputs recomputed closed-form
    by DuckDB.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

DDS_H, DDS_W = 6, 7
CPHD_NV, CPHD_NS = 2, 3


def _cphd_fixture(k: int) -> bytes:
    iq = np.empty((CPHD_NV, CPHD_NS, 2), ">f4")
    y, x = np.mgrid[0:CPHD_NV, 0:CPHD_NS]
    iq[..., 0] = (k + 2 * y + x) % 97
    iq[..., 1] = (k * 3 + x) % 53
    sig = iq.tobytes()
    xml = (f'<CPHD xmlns="urn:test"><CollectionID>'
           f"<CollectorName>C{k}</CollectorName>"
           "<CoreName>Core</CoreName>"
           "<CollectType>MONOSTATIC</CollectType>"
           "<RadarMode><ModeType>SPOTLIGHT</ModeType></RadarMode>"
           "</CollectionID><Data>"
           "<SignalArrayFormat>CF8</SignalArrayFormat>"
           "<NumBytesPVP>8</NumBytesPVP>"
           "<Channel><Identifier>1</Identifier>"
           f"<NumVectors>{CPHD_NV}</NumVectors>"
           f"<NumSamples>{CPHD_NS}</NumSamples></Channel>"
           "</Data><PVP><TxTime><Offset>0</Offset><Size>1</Size>"
           "<Format>F8</Format></TxTime></PVP></CPHD>").encode()
    pvp = struct.pack(">d", float(k)) * CPHD_NV
    hdr = (f"CPHD/1.1.0\n"
           f"XML_BLOCK_SIZE := {len(xml)}\n"
           "XML_BLOCK_BYTE_OFFSET := 512\n"
           f"PVP_BLOCK_SIZE := {len(pvp)}\n"
           "PVP_BLOCK_BYTE_OFFSET := 2048\n"
           f"SIGNAL_BLOCK_SIZE := {len(sig)}\n"
           "SIGNAL_BLOCK_BYTE_OFFSET := 2304\n"
           "CLASSIFICATION := UNCLASSIFIED\n"
           "RELEASE_INFO := UNRESTRICTED\n"
           "\f\n").encode()
    blob = bytearray(2304 + len(sig))
    blob[:len(hdr)] = hdr
    blob[512:512 + len(xml)] = xml
    blob[2048:2048 + len(pvp)] = pvp
    blob[2304:] = sig
    return bytes(blob)


def wave11_mod(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.sources.tables import load

    n = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("k"))

    @pandas_udf(T.ArrayType(T.DoubleType()))
    def probe(keys: pd.Series) -> pd.Series:
        from gdal_spark.raster.cphd import cphd_open
        from gdal_spark.raster.dds import (
            dds_decode, dds_encode_uncompressed)
        from gdal_spark.sources.edigeo import edigeo_open
        from gdal_spark.sources.tiger import tiger_open

        out = []
        for k in keys:
            k = int(k)
            # DDS round trip
            y, x = np.mgrid[0:DDS_H, 0:DDS_W]
            band = ((k * 5 + y * 2 + x) % 251).astype(np.uint8)
            rgba = np.stack([band, band, band,
                             np.full_like(band, 255)], axis=-1)
            dec, _ = dds_decode(dds_encode_uncompressed(rgba))
            dds_sum = float(dec[:, :, 0].astype(np.int64).sum())

            # CPHD signal sum
            cp = cphd_open(_cphd_fixture(k))
            sig = cp.channels[0]["signal"]
            cphd_sum = float(sig.real.sum())

            # TIGER chain
            rec = [" "] * 228
            rec[0] = "1"

            def put(beg, end, val):
                s = str(val).rjust(end - beg + 1)
                rec[beg - 1:end] = s

            put(6, 15, 77)
            put(191, 200, -(86000000 + k * 1000))
            put(201, 209, 32000000 + k * 1000)
            put(210, 219, -(86100000 + k * 1000))
            put(220, 228, 32100000 + k * 1000)
            rt2 = [" "] * 208
            rt2[0] = "2"
            rt2[5:15] = str(77).rjust(10)
            rt2[18:28] = str(-(86050000 + k * 1000)).rjust(10)
            rt2[28:37] = str(32050000 + k * 1000).rjust(9)
            m = tiger_open({"RT1": "".join(rec), "RT2": "".join(rt2)})
            g = m.chains[0]["geometry"]
            tiger_pts = float(len(g))
            tiger_sum = float(np.round(g.sum() * 1e6))

            # EDIGEO parcel

            def L(code, value):
                return f"{code}{len(value):02d}:{value}"

            wdt, hgt = 10 + k % 5, 20 + k % 3
            lines = [L("LONSA", "ED1"), L("GONSA", "SE"),
                     L("DINSA", "SE"), L("SCNSA", "SE"), L("GDNSA", "T1")]
            thf = "\n".join(lines)
            geo = L("RELSA", "LAMB1")
            dic = "\n".join([L("RTYSA", "DID"), L("RIDSA", "OBJ_PAR"),
                             L("LABSA", "PARCELLE")])
            scd = "\n".join([
                L("RTYSA", "OBJ"), L("RIDSA", "PARCELLE_id"),
                L("DIPCP", "SE;SE;DID;OBJ_PAR"), L("KNDSA", "ARE")])
            vec = "\n".join([
                L("RTYSA", "PAR"), L("RIDSA", "A1"),
                L("CORCC", "0;0"), L("CORCC", f"{wdt};0"),
                L("CORCC", f"{wdt};{hgt}"), L("CORCC", f"0;{hgt}"),
                L("CORCC", "0;0"),
                L("RTYSA", "FEA"), L("RIDSA", "F1"),
                L("SCPCP", "SE;SE;OBJ;PARCELLE_id"),
                L("RTYSA", "LNK"), L("RIDSA", "L1"),
                L("FTPCP", "SE;SE;FEA;F1"), L("FTPCP", "SE;SE;PFE;P1"),
                L("RTYSA", "LNK"), L("RIDSA", "L2"),
                L("FTPCP", "SE;SE;PAR;A1"), L("FTPCP", "SE;SE;PFE;P1"),
            ])
            lot = edigeo_open("E1.THF", {
                "E1.THF": thf, "ED1SE.GEO": geo, "ED1SE.DIC": dic,
                "ED1SE.SCD": scd, "ED1T1.VEC": vec,
            })
            feat = lot.layer_features("PARCELLE_id")[0]
            _, polys = feat["geometry"]
            ring = polys[0][0]
            closed = 1.0 if tuple(ring[0]) == tuple(ring[-1]) else 0.0
            area = float((ring[:, 0].max() - ring[:, 0].min())
                         * (ring[:, 1].max() - ring[:, 1].min()))
            out.append([dds_sum, cphd_sum, tiger_pts, tiger_sum,
                        closed, area])
        return pd.Series(out)

    r = probe(F.col("k"))
    return n.select(
        "k", r[0].alias("dds_sum"), r[1].alias("cphd_sum"),
        r[2].alias("tiger_pts"), r[3].alias("tiger_sum"),
        r[4].alias("ring_closed"), r[5].alias("parcel_area"),
    ).orderBy("k")


_W11_ORACLE = f"""
    SELECT n.n_nationkey AS k,
           CAST((SELECT SUM((n.n_nationkey*5 + y.range*2 + x.range) % 251)
                 FROM range({DDS_H}) y, range({DDS_W}) x)
                AS DOUBLE) AS dds_sum,
           CAST((SELECT SUM((n.n_nationkey + 2*y.range + x.range) % 97)
                 FROM range({CPHD_NV}) y, range({CPHD_NS}) x)
                AS DOUBLE) AS cphd_sum,
           CAST(3 AS DOUBLE) AS tiger_pts,
           CAST(-(86000000 + n.n_nationkey*1000)
                + (32000000 + n.n_nationkey*1000)
                - (86050000 + n.n_nationkey*1000)
                + (32050000 + n.n_nationkey*1000)
                - (86100000 + n.n_nationkey*1000)
                + (32100000 + n.n_nationkey*1000) AS DOUBLE) AS tiger_sum,
           CAST(1 AS DOUBLE) AS ring_closed,
           CAST((10 + n.n_nationkey % 5) * (20 + n.n_nationkey % 3)
                AS DOUBLE) AS parcel_area
    FROM nation n ORDER BY k
"""

SPARK = {"wave11_mod": wave11_mod}
ORACLE = {"wave11_mod": _W11_ORACLE}
