"""Driver-contract entry for the twelfth driver wave (Interlis 1,
AVCBin).

  wave12_mod — per nation key an Interlis ITF+IMD pair holding one
    rectangular area feature (polygonized through the _Form helper
    table; envelope area is closed-form) and a synthetic binary
    Arc/Info coverage (big-endian arc.adf + lab.adf) whose decoded
    vertex sums DuckDB recomputes exactly.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

_IMD = """<TRANSFER xmlns="http://www.interlis.ch/INTERLIS2.3">
<DATASECTION><IlisMeta07.ModelData BID="m">
<IlisMeta07.ModelData.Class TID="M.T.Parcel"><Name>Parcel</Name>
</IlisMeta07.ModelData.Class>
<IlisMeta07.ModelData.AttrOrParam TID="M.T.Parcel.Kind"><Name>Kind</Name>
<AttrParent REF="M.T.Parcel" ORDER_POS="1"></AttrParent>
<Type REF="M.T.Parcel.Kind.TYPE"></Type></IlisMeta07.ModelData.AttrOrParam>
<IlisMeta07.ModelData.NumType TID="M.T.Parcel.Kind.TYPE"><Name>TYPE</Name>
</IlisMeta07.ModelData.NumType>
<IlisMeta07.ModelData.AttrOrParam TID="M.T.Parcel.Shape"><Name>Shape</Name>
<AttrParent REF="M.T.Parcel" ORDER_POS="2"></AttrParent>
<Type REF="M.T.Parcel.Shape.TYPE"></Type></IlisMeta07.ModelData.AttrOrParam>
<IlisMeta07.ModelData.LineType TID="M.T.Parcel.Shape.TYPE"><Name>TYPE</Name>
<Kind>Area</Kind></IlisMeta07.ModelData.LineType>
</IlisMeta07.ModelData></DATASECTION></TRANSFER>"""


def _itf(k: int, w: int, h: int) -> str:
    cx, cy = w / 2.0, h / 2.0
    return "\n".join([
        "SCNT", "synthetic", "////", "MTID M", "MODL M",
        "TOPI T",
        "TABL Parcel_Shape",
        "OBJE 1",
        "STPT 0.0 0.0", f"LIPT {w}.0 0.0", f"LIPT {w}.0 {h}.0",
        f"LIPT 0.0 {h}.0", "LIPT 0.0 0.0", "ELIN",
        "ETAB",
        "TABL Parcel",
        f"OBJE 1 {k % 9} {cx} {cy}",
        "ETAB", "ETOP", "EMOD", "ENDE",
    ])


def _avc_geom(header_vals: bytes, body: bytes) -> bytes:
    out = bytearray(100)
    struct.pack_into(">iii", out, 0, 9994, 1, 0)
    struct.pack_into(">i", out, 24, (100 + len(body)) // 2)
    return bytes(out) + body


def wave12_mod(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.sources.tables import load

    n = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("k"))

    @pandas_udf(T.ArrayType(T.DoubleType()))
    def probe(keys: pd.Series) -> pd.Series:
        from gdal_spark.sources.avcbin import avcbin_read
        from gdal_spark.sources.interlis import itf_read

        out = []
        for k in keys:
            k = int(k)
            w, h = 10 + k % 7, 5 + k % 4
            layers = itf_read(_itf(k, w, h), _IMD)
            f = layers["T__Parcel"][0]
            kind, rings = f["geoms"]["Shape_poly"]
            ring = np.asarray(rings[0])
            area = float((ring[:, 0].max() - ring[:, 0].min())
                         * (ring[:, 1].max() - ring[:, 1].min()))
            kind_field = float(f["fields"]["Kind"])

            # synthetic AVC arc: one arc with key-derived vertices
            nv = 3 + k % 3
            pts = [(float(k + i), float(2 * k + 3 * i))
                   for i in range(nv)]
            body = struct.pack(">ii", 1, (24 + 8 * nv) // 2)
            body += struct.pack(">6i", k, 1, 2, 0, 0, nv)
            for x, y in pts:
                body += struct.pack(">ff", x, y)
            arc_adf = _avc_geom(b"", body)
            lab_body = struct.pack(">ii", 7, 1)
            lab_body += struct.pack(">6f", float(k), float(k + 1),
                                    0, 0, 0, 0)
            lab_adf = _avc_geom(b"", lab_body)
            d = avcbin_read({"cover/arc.adf": arc_adf,
                             "cover/lab.adf": lab_adf}, "syn")
            arc = d["layers"]["ARC"][0]
            import re
            nums = [float(v) for v in
                    re.findall(r"-?[\d.]+", arc["wkt"])]
            arc_sum = float(sum(nums))
            lab = d["layers"]["LAB"][0]
            out.append([area, kind_field, float(arc["UserID"] == str(k)),
                        float(len(nums) // 2), arc_sum,
                        float(lab["ValueId"]), float(lab["PolyId"])])
        return pd.Series(out)

    r = probe(F.col("k"))
    return n.select(
        "k", r[0].alias("parcel_area"), r[1].alias("kind"),
        r[2].alias("userid_ok"), r[3].alias("arc_nv"),
        r[4].alias("arc_sum"), r[5].alias("lab_value"),
        r[6].alias("lab_poly"),
    ).orderBy("k")


_W12_ORACLE = """
    SELECT n.n_nationkey AS k,
           CAST((10 + n.n_nationkey % 7) * (5 + n.n_nationkey % 4)
                AS DOUBLE) AS parcel_area,
           CAST(n.n_nationkey % 9 AS DOUBLE) AS kind,
           CAST(1 AS DOUBLE) AS userid_ok,
           CAST(3 + n.n_nationkey % 3 AS DOUBLE) AS arc_nv,
           CAST((SELECT SUM(n.n_nationkey + i.range
                            + 2*n.n_nationkey + 3*i.range)
                 FROM range(3) i) +
                CASE WHEN n.n_nationkey % 3 >= 1
                     THEN 3*n.n_nationkey + 4*3 ELSE 0 END +
                CASE WHEN n.n_nationkey % 3 = 2
                     THEN 3*n.n_nationkey + 4*4 ELSE 0 END
                AS DOUBLE) AS arc_sum,
           CAST(7 AS DOUBLE) AS lab_value,
           CAST(1 AS DOUBLE) AS lab_poly
    FROM nation n ORDER BY k
"""

SPARK = {"wave12_mod": wave12_mod}
ORACLE = {"wave12_mod": _W12_ORACLE}
