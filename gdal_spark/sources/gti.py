"""GTI tile index: a queryable virtual mosaic over an image corpus.

GDAL's GTI driver (frmts/gti/gdaltileindexdataset.cpp:84) exposes a vector
layer of (location, footprint-geometry) records as one seamless raster:
a windowed read consults the index, opens only the tiles whose footprints
intersect the window, and composites them in index order (painter's
algorithm), honoring LOCATION_FIELD/SORT_FIELD and RESX/RESY metadata.

Spark restatement:

  * the index IS a DataFrame/parquet table ``(location, minx, miny, maxx,
    maxy, w, h, fmt)`` sorted by Hilbert code at write time, so
    bbox-intersection predicates are plain Column comparisons that
    Catalyst pushes into the parquet scan — row-group min/max stats prune
    non-intersecting index regions without reading them (the analog of
    GTI's spatial filter on the index layer).
  * a windowed read is two stages, shaped exactly like tiles/pipeline.py:
    (1) PATCH (narrow): candidates = pruned-index x bytes join; each tile
    decodes once and warps onto every overlapping dst BLOCK grid —
    shuffled bytes stay proportional to output area; (2) COMPOSITE (the
    only shuffle, hash on the block key): paint patches in ``location``
    order = GTI SORT_FIELD semantics.

At 10^12 images the index is ~40 bytes/row parquet — prunable, splittable,
and the only thing the planner touches; pixel bytes move exclusively for
tiles that survive the window predicate.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gdal_spark.functions import hilbert as HB

INDEX_COLS = ["location", "minx", "miny", "maxx", "maxy", "w", "h", "fmt"]

PATCH_SCHEMA = T.StructType(
    [
        T.StructField("bx", T.IntegerType()),
        T.StructField("by", T.IntegerType()),
        T.StructField("location", T.StringType()),
        T.StructField("rgb", T.BinaryType()),
        T.StructField("alpha", T.BinaryType()),
    ]
)

BLOCK_SCHEMA = T.StructType(
    [
        T.StructField("bx", T.IntegerType()),
        T.StructField("by", T.IntegerType()),
        T.StructField("rgb", T.BinaryType()),
        T.StructField("n_src", T.IntegerType()),
        T.StructField("src_ids", T.ArrayType(T.StringType())),
        T.StructField("valid_frac", T.DoubleType()),
    ]
)


def gdal_tindex(
    spark: SparkSession, index_shp: str, src_paths: list[str],
    tileindex_field: str = "location",
) -> int:
    """gdaltindex (apps/gdaltindex_lib.cpp): append each raster's footprint
    outline as a MULTIPOLYGON feature with a ``location`` attribute to a
    shapefile tile index; rasters already present (same location string)
    are skipped with no duplicate feature — the autotest's
    already-existing-rasters contract. Ring order follows the reference:
    UL -> UR -> LR -> LL -> UL in georeferenced space. Returns the number
    of features added.

    Probing runs distributed (one codec probe per task over the path
    list); only footprint metadata returns to the driver, so indexing a
    10^6-tile corpus moves no pixel data."""
    import pandas as pd
    from pyspark.sql import types as T2

    from gdal_spark.functions import wkb as W
    from gdal_spark.raster.vrt import _probe_source
    from gdal_spark.sources.vector_formats import (
        read_shapefile,
        write_shapefile,
    )

    existing: list[tuple[str, bytes]] = []
    if os.path.exists(index_shp):
        for r in read_shapefile(spark, index_shp).collect():
            existing.append((r[tileindex_field], bytes(r["wkb"])))
    seen = {loc for loc, _ in existing}
    new_paths = [p for p in src_paths if p not in seen]

    pdf = spark.createDataFrame(
        [(p,) for p in new_paths], "path: string"
    )

    def probe(batches):
        for b in batches:
            rows = []
            for p in b["path"]:
                pr = _probe_source(p)
                gt, w, h = pr["gt"], pr["w"], pr["h"]
                rows.append((p, float(gt[0]), float(gt[1]), float(gt[3]),
                             float(gt[5]), int(w), int(h)))
            yield pd.DataFrame(
                rows, columns=["path", "gt0", "gt1", "gt3", "gt5", "w", "h"]
            )

    schema = T2.StructType([
        T2.StructField("path", T2.StringType()),
        T2.StructField("gt0", T2.DoubleType()),
        T2.StructField("gt1", T2.DoubleType()),
        T2.StructField("gt3", T2.DoubleType()),
        T2.StructField("gt5", T2.DoubleType()),
        T2.StructField("w", T2.IntegerType()),
        T2.StructField("h", T2.IntegerType()),
    ])
    metas = pdf.mapInPandas(probe, schema).collect() if new_paths else []

    feats = list(existing)
    added = 0
    for m in metas:
        x0, x1 = m.gt0, m.gt0 + m.w * m.gt1
        y0, y1 = m.gt3, m.gt3 + m.h * m.gt5
        ring = np.array(
            [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]]
        )
        feats.append((m.path, W.write_multipolygon([[ring]])))
        added += 1

    fdf = spark.createDataFrame(
        [(loc, bytearray(wkb)) for loc, wkb in feats],
        f"{tileindex_field}: string, wkb: binary",
    )
    write_shapefile(fdf, index_shp)
    return added


def build_index(images: DataFrame) -> DataFrame:
    """Index rows from an images table carrying footprint columns
    (lon_min/lat_min/lon_max/lat_max, as datagen.with_footprint emits).
    Hilbert-ordered on the footprint center so parquet row groups are
    spatially coherent and min/max stats actually prune."""
    cx = (F.col("lon_min") + F.col("lon_max")) / 2
    cy = (F.col("lat_min") + F.col("lat_max")) / 2
    sx = F.round(F.lit(HB.HILBERT_MAX) * (cx + 180.0) / 360.0).cast("long")
    sy = F.round(F.lit(HB.HILBERT_MAX) * (cy + 85.0) / 170.0).cast("long")
    idx = images.select(
        F.col("image_id").alias("location"),
        F.col("lon_min").alias("minx"),
        F.col("lat_min").alias("miny"),
        F.col("lon_max").alias("maxx"),
        F.col("lat_max").alias("maxy"),
        "w",
        "h",
        "fmt",
        sx.alias("_sx"),
        sy.alias("_sy"),
    )
    idx = HB.with_hilbert_code(idx, "_sx", "_sy")
    return idx.sortWithinPartitions("hcode").select(*INDEX_COLS, "hcode")


def write_index(index: DataFrame, path: str) -> None:
    index.write.mode("overwrite").parquet(path)


def read_index(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def window_candidates(index: DataFrame, window: tuple[float, float, float, float]) -> DataFrame:
    """Index rows whose footprint intersects the window — pure Column
    predicates; over a parquet index these reach the scan as
    PushedFilters and prune row groups via min/max stats."""
    x0, y0, x1, y1 = window
    return index.filter(
        (F.col("minx") < F.lit(x1))
        & (F.col("maxx") > F.lit(x0))
        & (F.col("miny") < F.lit(y1))
        & (F.col("maxy") > F.lit(y0))
    )


def read_window(
    index: DataFrame,
    images: DataFrame,
    window: tuple[float, float, float, float],
    out_w: int,
    out_h: int,
    block: int = 256,
    resample: str = "near",
) -> DataFrame:
    """Windowed mosaic read -> DataFrame of dst blocks (bx, by, rgb bytes,
    lineage, valid fraction). `images` provides (image_id, bytes, fmt)."""
    x0, y0, x1, y1 = (float(v) for v in window)
    px = (x1 - x0) / out_w
    py = (y1 - y0) / out_h
    nbx = -(-out_w // block)
    nby = -(-out_h // block)

    cand = window_candidates(index, window)
    src = cand.join(
        images.select(F.col("image_id").alias("location"), "bytes"), "location"
    )

    def patches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from gdal_spark.functions import codecs
        from gdal_spark.raster.warp import warp_array

        cols = [f.name for f in PATCH_SCHEMA.fields]
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                arr = codecs.decode_image(bytes(r.bytes), r.fmt)
                th, tw = arr.shape[:2]
                src_gt = (r.minx, (r.maxx - r.minx) / tw, 0.0,
                          r.maxy, 0.0, -(r.maxy - r.miny) / th)
                # dst blocks overlapped by this tile's footprint
                bx0 = max(0, int((r.minx - x0) / (px * block)))
                bx1 = min(nbx - 1, int((r.maxx - x0) / (px * block)))
                by0 = max(0, int((y1 - r.maxy) / (py * block)))
                by1 = min(nby - 1, int((y1 - r.miny) / (py * block)))
                for by in range(by0, by1 + 1):
                    bh = min(block, out_h - by * block)
                    for bx in range(bx0, bx1 + 1):
                        bw = min(block, out_w - bx * block)
                        dst_gt = (x0 + bx * block * px, px, 0.0,
                                  y1 - by * block * py, 0.0, -py)
                        warped, mask = warp_array(
                            arr, src_gt, dst_gt, bh, bw,
                            src_crs="EPSG:4326", dst_crs="EPSG:4326",
                            resample=resample, return_mask=True,
                        )
                        if not mask.any():
                            continue
                        out.append(
                            (bx, by, r.location,
                             bytearray(np.ascontiguousarray(warped, np.uint8).tobytes()),
                             bytearray(np.packbits(mask).tobytes()))
                        )
            yield pd.DataFrame(out, columns=cols)

    def paint(key, pdf: pd.DataFrame) -> pd.DataFrame:
        bx, by = int(key[0]), int(key[1])
        bh = min(block, out_h - by * block)
        bw = min(block, out_w - bx * block)
        canvas = np.zeros((bh, bw, 3), dtype=np.uint8)
        painted = np.zeros((bh, bw), dtype=bool)
        pdf = pdf.sort_values("location")  # GTI SORT_FIELD order
        for r in pdf.itertuples(index=False):
            rgb = np.frombuffer(bytes(r.rgb), np.uint8).reshape(bh, bw, 3)
            mask = np.unpackbits(
                np.frombuffer(bytes(r.alpha), np.uint8), count=bh * bw
            ).reshape(bh, bw).astype(bool)
            canvas[mask] = rgb[mask]
            painted |= mask
        return pd.DataFrame(
            [
                (bx, by, bytearray(canvas.tobytes()), len(pdf),
                 sorted(pdf["location"].tolist()),
                 float(painted.mean()))
            ],
            columns=[f.name for f in BLOCK_SCHEMA.fields],
        )

    return src.mapInPandas(patches, PATCH_SCHEMA).groupBy("bx", "by").applyInPandas(
        paint, BLOCK_SCHEMA
    )
