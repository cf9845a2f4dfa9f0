"""Distributed polygonize: raster -> one polygon per connected region.

Re-expresses GDALPolygonize (alg/polygonize.cpp:73,518 + enumerator
alg/gdalrasterpolygonenumerator.cpp + ring assembly
alg/polygonize_polygonizer.cpp) for a tiled raster spread across
executors. The reference runs one two-pass scanline labeling over the
whole raster; at cluster scale the raster is tiles on different machines,
so the plan becomes:

  A. per tile (mapInPandas, narrow): union-find CCL inside the tile
     (kernels.label_components — the same two-pass merge-table algorithm
     the enumerator uses), trace every region's pixel-edge rings in
     GLOBAL pixel coords, and emit
       - region rows  (rid, cls, npix, rings wkb)
       - edge records (boundary pixels on each tile side: which region
         touches global edge position p with class c)
  B. equivalence edges: self-join the edge records of facing tile sides
     on (edge key, position, class) -> (rid_a, rid_b) pairs — two
     regions in adjacent tiles are the same global region iff they have
     4-adjacent equal-valued pixels across the shared border (exactly
     the enumerator's cross-line merge rule applied at tile granularity).
  C. connected components over the equivalence graph by iterative
     hash-min label propagation (converges in <= graph-diameter rounds;
     each round is one shuffle on a table with one row per border
     region — tiny next to the pixel data).
  D. groupBy(component): merge member ring sets by cancelling opposite
     directed unit edges on shared borders and re-chaining
     (kernels.merge_rings), sum pixel counts.

Output: (region_id, cls, npix, wkb, area) — one row per global region,
rings identical to what a single-machine trace of the stitched raster
produces (tests assert exactly that).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TILE_SCHEMA = T.StructType(
    [
        T.StructField("tx", T.IntegerType()),
        T.StructField("ty", T.IntegerType()),
        T.StructField("tw", T.IntegerType()),
        T.StructField("th", T.IntegerType()),
        T.StructField("px", T.BinaryType()),  # uint8 th*tw class values
    ]
)

_STAGE_A_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.StringType()),  # 'region' | 'edge'
        T.StructField("rid", T.LongType()),
        T.StructField("cls", T.IntegerType()),
        T.StructField("npix", T.LongType()),
        T.StructField("wkb", T.BinaryType()),
        T.StructField("ekey", T.LongType()),  # packed shared-border id
        T.StructField("pos", T.IntegerType()),  # global position along border
        T.StructField("side", T.IntegerType()),  # 0 = low tile, 1 = high tile
    ]
)


def tiles_from_array(spark: SparkSession, arr: np.ndarray, tile: int) -> DataFrame:
    """Test/bench helper: split a global uint8 array into tile rows."""
    h, w = arr.shape
    rows = []
    for ty in range(0, (h + tile - 1) // tile):
        for tx in range(0, (w + tile - 1) // tile):
            blk = arr[ty * tile : (ty + 1) * tile, tx * tile : (tx + 1) * tile]
            rows.append((tx, ty, blk.shape[1], blk.shape[0],
                         bytearray(np.ascontiguousarray(blk, dtype=np.uint8).tobytes())))
    return spark.createDataFrame(rows, TILE_SCHEMA)


def _pack_rid(tx: int, ty: int, local: int) -> int:
    return (int(tx) << 40) | (int(ty) << 20) | int(local)


def _pack_ekey(vertical: bool, a: int, b: int) -> int:
    return (1 << 62 if vertical else 0) | (int(a) << 28) | int(b)


def polygonize(
    tiles: DataFrame, tile: int, connect: int = 4,
    exclude_value: int | None = None, max_iters: int = 50,
) -> DataFrame:
    """tiles: TILE_SCHEMA rows on a uniform `tile`-sized grid."""
    spark = tiles.sparkSession

    def stage_a(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from gdal_spark.functions import wkb as W
        from gdal_spark.raster import kernels as K

        cols = [f.name for f in _STAGE_A_SCHEMA.fields]
        for pdf in batches:
            out = []
            for t in pdf.itertuples(index=False):
                vals = np.frombuffer(bytes(t.px), dtype=np.uint8).reshape(t.th, t.tw)
                mask = None if exclude_value is None else (vals != exclude_value)
                labs = K.label_components(vals, connect=connect, mask=mask)
                x_off, y_off = t.tx * tile, t.ty * tile
                for lid in np.unique(labs[labs >= 0]):
                    region = labs == lid
                    rings = K.region_rings(region, x_off=x_off, y_off=y_off)
                    cls = int(vals[region][0])
                    rid = _pack_rid(t.tx, t.ty, int(lid))
                    out.append(("region", rid, cls, int(region.sum()),
                                bytearray(W.write_polygon(rings)), 0, 0, 0))
                # border records: right edge pairs with (tx+1)'s left edge,
                # bottom edge with (ty+1)'s top edge
                h, w = vals.shape
                def emit_edges(sel_labs, sel_vals, ekey, base, side):
                    ok = sel_labs >= 0
                    for p in np.flatnonzero(ok):
                        out.append(
                            ("edge", _pack_rid(t.tx, t.ty, int(sel_labs[p])),
                             int(sel_vals[p]), 0, None, ekey, int(base + p), side)
                        )
                emit_edges(labs[:, w - 1], vals[:, w - 1],
                           _pack_ekey(True, t.tx, t.ty), y_off, 0)   # my right
                emit_edges(labs[:, 0], vals[:, 0],
                           _pack_ekey(True, t.tx - 1, t.ty), y_off, 1)  # left nbr's right
                emit_edges(labs[h - 1, :], vals[h - 1, :],
                           _pack_ekey(False, t.tx, t.ty), x_off, 0)  # my bottom
                emit_edges(labs[0, :], vals[0, :],
                           _pack_ekey(False, t.tx, t.ty - 1), x_off, 1)  # top nbr's bottom
            yield pd.DataFrame(out, columns=cols)

    a = tiles.mapInPandas(stage_a, _STAGE_A_SCHEMA).persist()
    regions = a.filter(F.col("kind") == "region").select("rid", "cls", "npix", "wkb")
    edges = a.filter(F.col("kind") == "edge").select("rid", "cls", "ekey", "pos", "side")

    # B: equivalence pairs across facing sides (equal class, same position)
    lo = edges.filter(F.col("side") == 0).select(
        "ekey", "pos", F.col("cls").alias("cls0"), F.col("rid").alias("rid_a"))
    hi = edges.filter(F.col("side") == 1).select(
        "ekey", "pos", F.col("cls").alias("cls1"), F.col("rid").alias("rid_b"))
    pairs = (
        lo.join(hi, on=["ekey", "pos"])
        .filter(F.col("cls0") == F.col("cls1"))
        .select("rid_a", "rid_b")
        .distinct()
    )

    # C: min-label connected components over the region graph via the
    # shared fixpoint operator (operators/components.py): each round is
    # one join + one groupBy-min with localCheckpoint lineage truncation,
    # so the logical plan stays O(1) per round — the original in-module
    # loop used persist() only, and its plan grew per iteration until
    # Catalyst analysis dominated wall time on high-diameter graphs
    # (a region spanning all tiles). Iterations ~ adjacency diameter.
    from gdal_spark.operators.components import connected_components

    cc = connected_components(pairs, src="rid_a", dst="rid_b", max_iter=max_iters)
    comp = regions.select("rid").join(
        cc.withColumnRenamed("node", "rid"), on="rid", how="left"
    ).select(
        "rid", F.coalesce(F.col("component"), F.col("rid")).alias("comp")
    )

    # D: merge ring sets per component
    member = regions.join(comp, on="rid")

    out_schema = T.StructType(
        [
            T.StructField("region_id", T.LongType()),
            T.StructField("cls", T.IntegerType()),
            T.StructField("npix", T.LongType()),
            T.StructField("wkb", T.BinaryType()),
            T.StructField("area", T.DoubleType()),
        ]
    )

    def merge(key, pdf: pd.DataFrame) -> pd.DataFrame:
        from gdal_spark.functions import geom as G
        from gdal_spark.functions import wkb as W
        from gdal_spark.raster import kernels as K

        ring_sets = [W.polygon_rings(bytes(b))[0] for b in pdf["wkb"]]
        if len(ring_sets) == 1:
            rings = ring_sets[0]
        else:
            rings = K.merge_rings(ring_sets)
        buf = W.write_polygon(rings)
        return pd.DataFrame(
            [
                (
                    int(key[0]), int(pdf["cls"].iloc[0]), int(pdf["npix"].sum()),
                    bytearray(buf), float(G.wkb_area(buf)),
                )
            ],
            columns=[f.name for f in out_schema.fields],
        )

    return member.groupBy("comp").applyInPandas(merge, out_schema)
