"""Driver-contract entries for the Sentinel-2 / PDS4 driver wave.

Both queries are closed-form so DuckDB recomputes every output value:

  sentinel2_mod — per nation key a synthetic two-granule L1C SAFE
    product (product MTD + per-tile Tile_Geocoding XMLs) whose second
    tile is offset by a key-dependent pixel delta; the engine's
    subdataset mosaic (band ordering with the 02/03/04 -> 04/03/02 RGB
    swap, extent union, per-tile DstRect placement —
    frmts/sentinel2/sentinel2dataset.cpp) must reproduce the closed
    form: tile 2 lands at (5000 + (k%7)*4, 4800 + (k%5)*4) and the
    mosaic is that plus the 100-px tile.

  pds4_grid_mod — per nation key a PDS4 Product_Observational label +
    SignedMSB2 Array_2D payload with pixel(r, c) =
    (k*7 + r*11 + c*3) % 1000 and a cart:Cartography block with a
    key-dependent upper-left corner; the engine's label parser + axis
    resolver + geotransform builder (frmts/pds4/pds4dataset.cpp) is
    checked via per-row sums and the geotransform origin.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

S2_TILE = 100          # tile size in pixels at 10m


def _s2_deltas(k: int):
    return 5000 + (k % 7) * 4, 4800 + (k % 5) * 4


def _synth_s2_product(tmpdir: str, k: int) -> str:
    """Write a minimal old-style L1C SAFE: product MTD + two granule
    MTDs (no JP2 payloads needed — placement is label-driven)."""
    dx, dy = _s2_deltas(k)
    ulx0, uly0 = 600000, 5000000
    gids = [f"S2A_OPER_MSI_L1C_TA{k}_N01.03",
            f"S2A_OPER_MSI_L1C_TB{k}_N01.03"]
    uls = [(ulx0, uly0), (ulx0 + dx * 10, uly0 - dy * 10)]
    gran_xml = []
    for gid, (ulx, uly) in zip(gids, uls):
        gdir = os.path.join(tmpdir, "GRANULE", gid)
        os.makedirs(gdir)
        with open(os.path.join(gdir, "MTD.xml"), "w") as f:
            f.write(
                "<Tile><Tile_Geocoding>"
                "<HORIZONTAL_CS_CODE>EPSG:32632</HORIZONTAL_CS_CODE>"
                f'<Size resolution="10"><NROWS>{S2_TILE}</NROWS>'
                f"<NCOLS>{S2_TILE}</NCOLS></Size>"
                f'<Geoposition resolution="10"><ULX>{ulx}</ULX>'
                f"<ULY>{uly}</ULY><XDIM>10</XDIM><YDIM>-10</YDIM>"
                "</Geoposition></Tile_Geocoding></Tile>")
        ids = "".join(
            f"<IMAGE_ID>{gid[:-7]}_B{b}</IMAGE_ID>"
            for b in ("02", "03", "04", "08"))
        gran_xml.append(
            f'<Granules granuleIdentifier="{gid}">{ids}</Granules>')
    path = os.path.join(tmpdir, "MTD_SAFL1C.xml")
    bands = "".join(f"<BAND_NAME>{b}</BAND_NAME>"
                    for b in ("B2", "B3", "B4", "B8"))
    with open(path, "w") as f:
        f.write(
            "<Level-1C_User_Product><General_Info><Product_Info>"
            f"<Query_Options><Band_List>{bands}</Band_List>"
            "</Query_Options><Product_Organisation>"
            f"<Granule_List>{gran_xml[0]}</Granule_List>"
            f"<Granule_List>{gran_xml[1]}</Granule_List>"
            "</Product_Organisation></Product_Info></General_Info>"
            "</Level-1C_User_Product>")
    return path


def sentinel2_mod(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.sources.tables import load

    n = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("k")
    )

    @pandas_udf(T.ArrayType(T.ArrayType(T.LongType())))
    def placements(keys: pd.Series) -> pd.Series:
        from gdal_spark.raster.sentinel2 import sentinel2_open

        out = []
        for k in keys:
            tmpdir = tempfile.mkdtemp(prefix="s2_")
            try:
                xml = _synth_s2_product(tmpdir, int(k))
                ds = sentinel2_open(
                    f"SENTINEL2_L1C:{xml}:10m:EPSG_32632")
                rows = []
                per_band_count = {}
                for bi, _f, _src, dst in ds.sources:
                    gran = per_band_count.get(bi, 0)
                    per_band_count[bi] = gran + 1
                    band = ds.bands[bi - 1]
                    rows.append([bi, int(band.metadata["WAVELENGTH"]),
                                 gran, dst[0], dst[1],
                                 ds.width, ds.height])
                out.append(rows)
            finally:
                shutil.rmtree(tmpdir, ignore_errors=True)
        return pd.Series(out)

    row = F.explode(placements(F.col("k"))).alias("r")
    return n.select(F.col("k"), row).select(
        "k",
        F.col("r")[0].alias("band_pos"),
        F.col("r")[1].alias("wavelength"),
        F.col("r")[2].alias("gran_id"),
        F.col("r")[3].alias("xoff"),
        F.col("r")[4].alias("yoff"),
        F.col("r")[5].alias("mosaic_w"),
        F.col("r")[6].alias("mosaic_h"),
    )


# band order after the RGB swap: B4(665), B3(560), B2(490), B8(842)
_S2_ORACLE = f"""
    SELECT n.n_nationkey AS k,
           b.range + 1 AS band_pos,
           CASE b.range WHEN 0 THEN 665 WHEN 1 THEN 560
                        WHEN 2 THEN 490 ELSE 842 END AS wavelength,
           g.range AS gran_id,
           CASE WHEN g.range = 0 THEN 0
                ELSE 5000 + (n.n_nationkey % 7) * 4 END AS xoff,
           CASE WHEN g.range = 0 THEN 0
                ELSE 4800 + (n.n_nationkey % 5) * 4 END AS yoff,
           5000 + (n.n_nationkey % 7) * 4 + {S2_TILE} AS mosaic_w,
           4800 + (n.n_nationkey % 5) * 4 + {S2_TILE} AS mosaic_h
    FROM nation n CROSS JOIN range(4) b CROSS JOIN range(2) g
"""


P4_W, P4_H = 10, 6


def _synth_pds4(tmpdir: str, k: int) -> str:
    """A PDS4 label + raw SignedMSB2 payload around the closed form."""
    import struct as _struct

    dat = bytearray()
    for r in range(P4_H):
        for c in range(P4_W):
            dat += _struct.pack(">h", (k * 7 + r * 11 + c * 3) % 1000)
    with open(os.path.join(tmpdir, "img.dat"), "wb") as f:
        f.write(bytes(dat))
    ulx = -59280 + k * 60
    uly = 3751320 - k * 60
    path = os.path.join(tmpdir, "label.xml")
    with open(path, "w") as f:
        f.write(
            '<?xml version="1.0"?>'
            "<Product_Observational><File_Area_Observational>"
            "<File><file_name>img.dat</file_name></File>"
            "<Array_2D><offset>0</offset>"
            "<data_type>SignedMSB2</data_type>"
            "<Axis_Array><axis_name>Line</axis_name>"
            f"<elements>{P4_H}</elements>"
            "<sequence_number>1</sequence_number></Axis_Array>"
            "<Axis_Array><axis_name>Sample</axis_name>"
            f"<elements>{P4_W}</elements>"
            "<sequence_number>2</sequence_number></Axis_Array>"
            "</Array_2D></File_Area_Observational>"
            "<Cartography><Map_Projection>"
            "<map_projection_name>Equirectangular</map_projection_name>"
            "</Map_Projection><Geo_Transformation>"
            f"<upperleft_corner_x unit='m'>{ulx}</upperleft_corner_x>"
            f"<upperleft_corner_y unit='m'>{uly}</upperleft_corner_y>"
            "<pixel_resolution_x unit='m/pixel'>60</pixel_resolution_x>"
            "<pixel_resolution_y unit='m/pixel'>60</pixel_resolution_y>"
            "</Geo_Transformation></Cartography>"
            "</Product_Observational>")
    return path


def pds4_grid_mod(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.sources.tables import load

    n = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("k")
    )

    @pandas_udf(T.ArrayType(T.ArrayType(T.DoubleType())))
    def decode(keys: pd.Series) -> pd.Series:
        from gdal_spark.raster.pds4 import pds4_open

        out = []
        for k in keys:
            tmpdir = tempfile.mkdtemp(prefix="pds4_")
            try:
                label = _synth_pds4(tmpdir, int(k))
                ds = pds4_open(label)
                a = ds.read()
                assert a.shape == (1, P4_H, P4_W)
                gt = ds.geotransform
                out.append([
                    [float(r), float(a[0, r].astype("float64").sum()),
                     float(gt[0]), float(gt[3])]
                    for r in range(P4_H)])
            finally:
                shutil.rmtree(tmpdir, ignore_errors=True)
        return pd.Series(out)

    row = F.explode(decode(F.col("k"))).alias("r")
    return n.select(F.col("k"), row).select(
        "k",
        F.col("r")[0].cast("long").alias("row_id"),
        F.col("r")[1].alias("row_sum"),
        F.col("r")[2].alias("gt_x"),
        F.col("r")[3].alias("gt_y"),
    )


_PDS4_ORACLE = f"""
    SELECT n.n_nationkey AS k, r.range AS row_id,
           sum(CAST((n.n_nationkey * 7 + r.range * 11 + c.range * 3)
                    % 1000 AS DOUBLE)) AS row_sum,
           CAST(-59280 + n.n_nationkey * 60 AS DOUBLE) AS gt_x,
           CAST(3751320 - n.n_nationkey * 60 AS DOUBLE) AS gt_y
    FROM nation n CROSS JOIN range({P4_H}) r CROSS JOIN range({P4_W}) c
    GROUP BY n.n_nationkey, r.range
"""


ST_TILE = 20       # STACIT synth tile pixels at 60 m


def _synth_stacit(tmpdir: str, k: int) -> str:
    """Two-item STAC FeatureCollection with a key-dependent offset."""
    import json

    dx = 20 + (k % 5) * 3          # pixels east
    dy = 10 + (k % 3) * 4          # pixels south
    ulx0, uly0 = 440720, 3751320
    feats = []
    for i, (ulx, uly) in enumerate(
            [(ulx0, uly0), (ulx0 + dx * 60, uly0 - dy * 60)]):
        feats.append({
            "type": "Feature",
            "id": f"it{i}",
            "properties": {"datetime": f"2021-07-1{i}T00:00:00Z",
                           "proj:epsg": 26711},
            "collection": "c",
            "assets": {"B01": {
                "href": f"t{i}.tif", "roles": ["data"],
                "proj:bbox": [ulx, uly - ST_TILE * 60,
                              ulx + ST_TILE * 60, uly],
                "proj:transform": [60, 0, ulx, 0, -60, uly],
            }},
        })
    path = os.path.join(tmpdir, "items.json")
    with open(path, "w") as f:
        json.dump({"type": "FeatureCollection", "features": feats}, f)
    return path


def stacit_mod(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.sources.tables import load

    n = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("k")
    )

    @pandas_udf(T.ArrayType(T.ArrayType(T.LongType())))
    def placements(keys: pd.Series) -> pd.Series:
        from gdal_spark.sources.stacit import stacit_open

        out = []
        for k in keys:
            tmpdir = tempfile.mkdtemp(prefix="stacit_")
            try:
                ds = stacit_open(_synth_stacit(tmpdir, int(k)))
                rows = []
                for i, (_href, _src, dst) in enumerate(ds.sources):
                    rows.append([i, dst[0], dst[1],
                                 ds.width, ds.height])
                out.append(rows)
            finally:
                shutil.rmtree(tmpdir, ignore_errors=True)
        return pd.Series(out)

    row = F.explode(placements(F.col("k"))).alias("r")
    return n.select(F.col("k"), row).select(
        "k",
        F.col("r")[0].alias("item_id"),
        F.col("r")[1].alias("xoff"),
        F.col("r")[2].alias("yoff"),
        F.col("r")[3].alias("mosaic_w"),
        F.col("r")[4].alias("mosaic_h"),
    )


_STACIT_ORACLE = f"""
    SELECT n.n_nationkey AS k, i.range AS item_id,
           CASE WHEN i.range = 0 THEN 0
                ELSE 20 + (n.n_nationkey % 5) * 3 END AS xoff,
           CASE WHEN i.range = 0 THEN 0
                ELSE 10 + (n.n_nationkey % 3) * 4 END AS yoff,
           20 + (n.n_nationkey % 5) * 3 + {ST_TILE} AS mosaic_w,
           10 + (n.n_nationkey % 3) * 4 + {ST_TILE} AS mosaic_h
    FROM nation n CROSS JOIN range(2) i
"""


SPARK = {
    "sentinel2_mod": sentinel2_mod,
    "pds4_grid_mod": pds4_grid_mod,
    "stacit_mod": stacit_mod,
}

ORACLE = {
    "sentinel2_mod": _S2_ORACLE,
    "pds4_grid_mod": _PDS4_ORACLE,
    "stacit_mod": _STACIT_ORACLE,
}
