"""Driver-contract entries for the round-2 fourth driver wave
(AAIGrid/XYZ/ENVI/FITS/VICAR codecs, TopoJSON/ESRIJSON vector parsing).

Both queries are closed-form so DuckDB recomputes every output value:

  asciigrid_fits_chain — the quarter-step DEM is pushed AAIGrid ->
    XYZ -> ENVI -> FITS -> VICAR (every hop float32-exact: %.20g /
    %.17g ASCII, raw binary, big-endian FITS, VICAR records) and the
    final hop is decoded distributedly; per-row sums must hash-match
    the closed form. Any writer/reader value slip fails the gate.

  jsonvec_topo_mod — one TopoJSON Topology + one ESRIJSON point per
    nation, built from the nation key, parsed by the engine's decoders;
    the delta-decoded/quantized arc coordinates are affine in the key,
    so the oracle recomputes them exactly.
"""

from __future__ import annotations

import os
import tempfile

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

GRID_H = GRID_W = 16


def asciigrid_fits_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from gdal_spark.raster.asciigrid import aaig_decode, aaig_encode
    from gdal_spark.raster.envi import envi_decode, envi_encode
    from gdal_spark.raster.fits import fits_decode, fits_encode
    from gdal_spark.raster.vicar import vicar_decode, vicar_encode
    from gdal_spark.raster.xyzgrid import xyz_decode, xyz_encode

    r, c = np.meshgrid(np.arange(GRID_H), np.arange(GRID_W), indexing="ij")
    dem = (((r * 37 + c * 101) % 97) * 0.25).astype(np.float32)
    gt = (500.0, 2.0, 0.0, 800.0, 0.0, -2.0)

    a1, m1 = aaig_decode(aaig_encode(dem, gt).encode())
    a2, m2 = xyz_decode(xyz_encode(a1.astype(np.float32), m1["gt"]))
    hdr, body = envi_encode(a2.astype(np.float32), gt=m2["gt"])
    a3, _ = envi_decode(hdr, body)
    a4, _ = fits_decode(fits_encode(a3))
    raw = vicar_encode(a4)

    sdf = spark.createDataFrame([(bytearray(raw),)], "data binary")

    @pandas_udf(T.ArrayType(T.DoubleType()))
    def row_sums(data: pd.Series) -> pd.Series:
        import numpy as np

        out = []
        for d in data:
            arr, _ = vicar_decode(bytes(d))
            out.append([float(v) for v in
                        arr.astype(np.float64).sum(axis=1)])
        return pd.Series(out)

    return sdf.select(
        F.posexplode(row_sums(F.col("data"))).alias("row_id", "row_sum")
    )


_CHAIN_ORACLE = f"""
    SELECT r.range AS row_id,
           sum(((r.range * 37 + c.range * 101) % 97) * 0.25) AS row_sum
    FROM range({GRID_H}) r CROSS JOIN range({GRID_W}) c
    GROUP BY r.range
"""


def jsonvec_topo_mod(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.sources.tables import load

    n = load(spark, sf_dir, "nation")

    sch = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("x0", T.DoubleType()),
        T.StructField("y0", T.DoubleType()),
        T.StructField("x2", T.DoubleType()),
        T.StructField("y2", T.DoubleType()),
        T.StructField("ex", T.DoubleType()),
        T.StructField("ey", T.DoubleType()),
    ])

    def run(batches):
        import re

        from gdal_spark.sources.jsonfmts import (
            esrijson_geom_wkt, topojson_layers,
        )

        for pdf in batches:
            rows = []
            for k in pdf["n_nationkey"]:
                k = int(k)
                doc = (
                    '{"type":"Topology",'
                    '"transform":{"scale":[0.5,0.25],'
                    '"translate":[100,200]},'
                    '"arcs":[[[%d,%d],[1,1],[1,1]]],'
                    '"objects":{"lyr":{"type":"GeometryCollection",'
                    '"geometries":[{"type":"LineString","arcs":[0]}]}}}'
                    % (k, 2 * k)
                )
                feat = topojson_layers(doc)["lyr"][0]
                pts = [tuple(float(t) for t in pair.split())
                       for pair in re.findall(
                           r"-?[\d.]+ -?[\d.]+", feat["wkt"])]
                ewkt = esrijson_geom_wkt({"x": k * 2.5, "y": k - 12.5})
                em = re.findall(r"-?[\d.]+", ewkt)
                rows.append((k, pts[0][0], pts[0][1], pts[2][0],
                             pts[2][1], float(em[0]), float(em[1])))
            yield pd.DataFrame(
                rows, columns=["k", "x0", "y0", "x2", "y2", "ex", "ey"])

    return (
        n.select("n_nationkey")
        .mapInPandas(run, schema=sch)
        .orderBy("k")
    )


_TOPO_ORACLE = """
    SELECT CAST(n_nationkey AS BIGINT) AS k,
           100 + 0.5 * n_nationkey AS x0,
           200 + 0.25 * (2 * n_nationkey) AS y0,
           100 + 0.5 * (n_nationkey + 2) AS x2,
           200 + 0.25 * (2 * n_nationkey + 2) AS y2,
           n_nationkey * 2.5 AS ex,
           n_nationkey - 12.5 AS ey
    FROM nation
    ORDER BY k
"""


def surfer_pcraster_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same closed-form DEM pushed GSBG -> GS7BG -> GSAG ->
    PCRaster CSF -> ISCE (float32-exact at every hop; the Surfer
    ASCII hop prints %.10g which is exact for quarter steps), final
    hop decoded distributedly. Reference semantics: frmts/gsg,
    frmts/pcraster libcsf, frmts/raw/iscedataset.cpp."""
    import numpy as np

    from gdal_spark.raster.gsgrids import (
        gs7bg_decode, gs7bg_encode, gsag_decode, gsag_encode,
        gsbg_decode, gsbg_encode,
    )
    from gdal_spark.raster.isce_eir import isce_decode, isce_encode
    from gdal_spark.raster.pcraster import csf_decode, csf_encode

    r, c = np.meshgrid(np.arange(GRID_H), np.arange(GRID_W), indexing="ij")
    dem = (((r * 37 + c * 101) % 97) * 0.25).astype(np.float32)
    gt = (500.0, 2.0, 0.0, 800.0, 0.0, -2.0)

    a1, m1 = gsbg_decode(gsbg_encode(dem, gt))
    a2, m2 = gs7bg_decode(gs7bg_encode(a1.astype(np.float64), m1["gt"]))
    a3, m3 = gsag_decode(gsag_encode(a2, m2["gt"]).encode())
    a4, m4 = csf_decode(csf_encode(a3.astype(np.float32), m3["gt"]))
    body, xml = isce_encode(a4, gt=m4["gt"])

    sdf = spark.createDataFrame([(bytearray(body), xml)],
                                "data binary, xml string")

    @pandas_udf(T.ArrayType(T.DoubleType()))
    def row_sums(data: pd.Series, xml_s: pd.Series) -> pd.Series:
        import numpy as np

        out = []
        for d, x in zip(data, xml_s):
            arr, _ = isce_decode(bytes(d), x)
            out.append([float(v) for v in
                        arr.astype(np.float64).sum(axis=1)])
        return pd.Series(out)

    return sdf.select(
        F.posexplode(row_sums(F.col("data"), F.col("xml"))).alias(
            "row_id", "row_sum")
    )


SPARK = {
    "asciigrid_fits_chain": asciigrid_fits_chain,
    "jsonvec_topo_mod": jsonvec_topo_mod,
    "surfer_pcraster_chain": surfer_pcraster_chain,
}
ORACLE = {
    "asciigrid_fits_chain": _CHAIN_ORACLE,
    "jsonvec_topo_mod": _TOPO_ORACLE,
    "surfer_pcraster_chain": _CHAIN_ORACLE,
}
