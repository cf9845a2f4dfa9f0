"""Cell-partitioned spatial join — the flagship operator.

Re-expresses OGR layer-algebra Intersection (ogr/ogrsf_frmts/generic/
ogrlayer.cpp:5385) for the 100 TB regime:

  GDAL (single node)                    gdal_spark (cluster)
  ------------------------------------  --------------------------------
  nested loop over input layer          cell equi-join (shuffle or
                                        broadcast on the packed cell key)
  envelope pre-filter on method extent  bbox column conjunction BEFORE the
  (ogrlayer.cpp:4004)                   exact UDF (Catalyst-visible)
  prepared geometries per filter        per-Arrow-batch polygon prep inside
  (ogrlayer.cpp:3919)                   the pandas UDF (parse WKB once per
                                        distinct polygon per batch)
  -                                     pair dedup (same pair found in many
                                        cells) via the REFERENCE-POINT rule
                                        (keep the pair only in the one cell
                                        containing the intersection-bbox
                                        corner) — a filter, not a shuffle
  -                                     skew: hot cells salted S ways +
                                        AQE skew-join as backstop

Predicates:
  * center_within — image footprint center inside polygon (ray casting,
    ogrlinearring.cpp:452 semantics)
  * intersects    — image footprint box intersects polygon exactly
                    (box clip non-empty)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from gdal_spark.functions import cells as C
from gdal_spark.functions import geom


@pandas_udf(T.BooleanType())
def pip_udf(px: pd.Series, py: pd.Series, wkb_col: pd.Series) -> pd.Series:
    """Vectorized point-in-polygon: batches are grouped by distinct polygon
    so each polygon is parsed/prepared once and probed with a numpy array
    of points (prepared-geometry pattern)."""
    out = np.zeros(len(px), dtype=bool)
    pxv = px.to_numpy(dtype=np.float64)
    pyv = py.to_numpy(dtype=np.float64)
    codes, uniques = pd.factorize(wkb_col)
    for u, buf in enumerate(uniques):
        mask = codes == u
        out[mask] = geom.points_in_wkb(pxv[mask], pyv[mask], bytes(buf))
    return pd.Series(out)


@pandas_udf(T.BooleanType())
def box_intersects_udf(
    xmin: pd.Series, ymin: pd.Series, xmax: pd.Series, ymax: pd.Series, wkb_col: pd.Series
) -> pd.Series:
    """Exact box-polygon intersection: clip polygon to box, non-empty => hit.
    (Candidates already passed the bbox-overlap column prefilter.)"""
    out = np.zeros(len(xmin), dtype=bool)
    x0 = xmin.to_numpy(float)
    y0 = ymin.to_numpy(float)
    x1 = xmax.to_numpy(float)
    y1 = ymax.to_numpy(float)
    codes, uniques = pd.factorize(wkb_col)
    for u, buf in enumerate(uniques):
        buf = bytes(buf)
        idx = np.nonzero(codes == u)[0]
        for j in idx:
            out[j] = geom.clip_wkb_to_box(buf, x0[j], y0[j], x1[j], y1[j]) is not None
    return pd.Series(out)


def _cells_side(
    df: DataFrame, res: int, bbox: tuple[str, str, str, str], out: str = "cell"
) -> DataFrame:
    xmin, ymin, xmax, ymax = bbox
    return df.withColumn(
        out,
        F.explode(
            C.cover_cells(F.col(xmin), F.col(ymin), F.col(xmax), F.col(ymax), res)
        ),
    )


def spatial_join(
    left: DataFrame,
    polygons: DataFrame,
    res: int = 7,
    predicate: str = "center_within",
    left_bbox: tuple[str, str, str, str] = ("lon_min", "lat_min", "lon_max", "lat_max"),
    poly_bbox: tuple[str, str, str, str] = ("xmin", "ymin", "xmax", "ymax"),
    left_key: str = "image_id",
    poly_key: str = "poly_id",
    broadcast_polygons: bool | None = None,
    salt: int = 0,
    carry: list[str] | None = None,
) -> DataFrame:
    """Join `left` rows (bbox'd) to polygons (wkb + bbox) they hit.

    Returns left rows + matching polygon key columns (inner, 1:N across
    polygons, each pair exactly once).

    broadcast_polygons: None = let Catalyst/AQE decide (autoBroadcast
    threshold); True = force broadcast (dims <= ~64MB: no shuffle at all);
    False = shuffle path, optionally salted `salt` ways for hot cells.

    Exactly-once pairs WITHOUT a dedup shuffle:
      * center_within probes a point, which lies in exactly one cell —
        the left side is keyed by that single cell (no explode at all).
      * intersects explodes the left bbox, and a pair discovered in many
        shared cells is kept only in the cell containing the lower-left
        corner of the two bboxes' intersection (a point both cover sets
        contain) — the standard reference-point rule, evaluated as a
        Catalyst column filter instead of dropDuplicates.
    """
    if carry is not None:
        # prune to keys + bbox + requested pass-throughs BEFORE the join:
        # every column kept here is buffered through the Python-UDF filter
        # for millions of candidate pairs, so width is a first-order cost
        left = left.select(*dict.fromkeys([left_key, *left_bbox, *carry]))
        polygons = polygons.select(*dict.fromkeys([poly_key, *poly_bbox, "wkb"]))

    lx0, ly0, lx1, ly1 = (F.col(c) for c in left_bbox)
    if predicate == "center_within":
        lc = left.withColumn(
            "cell", C.lonlat_cell((lx0 + lx1) / 2.0, (ly0 + ly1) / 2.0, res)
        )
    else:
        lc = _cells_side(left, res, left_bbox, "cell")
    pc = _cells_side(polygons, res, poly_bbox, "cell")

    if salt > 1 and not broadcast_polygons:
        # replicate each polygon-cell row `salt` ways; probes pick one slot
        pc = pc.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
        lc = lc.withColumn("_salt", F.pmod(F.xxhash64(F.col(left_key)), F.lit(salt)))
        join_keys = ["cell", "_salt"]
    else:
        join_keys = ["cell"]

    if broadcast_polygons:
        pc = F.broadcast(pc)

    cand = lc.join(pc, on=join_keys, how="inner")

    # phase 1: envelope conjunction (Catalyst-visible, codegen'd)
    px0, py0, px1, py1 = (F.col(c) for c in poly_bbox)
    cand = cand.filter((lx0 <= px1) & (px0 <= lx1) & (ly0 <= py1) & (py0 <= ly1))

    # phase 2: exact kernel
    if predicate == "center_within":
        cx = (lx0 + lx1) / 2.0
        cy = (ly0 + ly1) / 2.0
        cand = cand.filter(pip_udf(cx, cy, F.col("wkb")))
    elif predicate == "intersects":
        # reference-point dedup BEFORE the exact kernel: evaluate the UDF
        # once per pair, not once per shared cell
        ref_cell = C.lonlat_cell(F.greatest(lx0, px0), F.greatest(ly0, py0), res)
        cand = cand.filter(F.col("cell") == ref_cell)
        cand = cand.filter(
            box_intersects_udf(lx0, ly0, lx1, ly1, F.col("wkb"))
        )
    else:
        raise ValueError(f"unknown predicate {predicate!r}")

    drop = ["cell"] + (["_salt"] if salt > 1 and not broadcast_polygons else [])
    return cand.drop(*drop)


def count_per_polygon(joined: DataFrame, poly_key: str = "poly_id") -> DataFrame:
    return joined.groupBy(poly_key).agg(F.count(F.lit(1)).alias("n_images"))
